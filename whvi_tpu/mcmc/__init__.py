from whvi_tpu.mcmc.chains import StructuredLogProb
from whvi_tpu.mcmc.diagnostics import ess, split_rhat, summarize
from whvi_tpu.mcmc.hmc import (
    HMCConfig,
    hmc_sample,
    hmc_sample_chains,
    make_whvi_g_log_posterior,
    moments,
)
from whvi_tpu.mcmc.nuts import NUTSConfig, nuts_sample, nuts_sample_chains
from whvi_tpu.mcmc.tempering import PTConfig, pt_sample, pt_sample_chains

__all__ = [
    "HMCConfig",
    "NUTSConfig",
    "PTConfig",
    "StructuredLogProb",
    "pt_sample",
    "pt_sample_chains",
    "ess",
    "hmc_sample",
    "hmc_sample_chains",
    "make_whvi_g_log_posterior",
    "moments",
    "nuts_sample",
    "nuts_sample_chains",
    "split_rhat",
    "summarize",
]
