from whvi_tpu.mcmc.hmc import (
    HMCConfig,
    hmc_sample,
    make_whvi_g_log_posterior,
    moments,
)
from whvi_tpu.mcmc.nuts import NUTSConfig, nuts_sample

__all__ = [
    "HMCConfig",
    "NUTSConfig",
    "hmc_sample",
    "make_whvi_g_log_posterior",
    "moments",
    "nuts_sample",
]
