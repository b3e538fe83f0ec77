from whvi_tpu.mcmc.hmc import (
    HMCConfig,
    hmc_sample,
    make_whvi_g_log_posterior,
    moments,
)

__all__ = [
    "HMCConfig",
    "hmc_sample",
    "make_whvi_g_log_posterior",
    "moments",
]
