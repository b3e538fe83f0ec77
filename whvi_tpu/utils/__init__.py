from whvi_tpu.utils.metrics import JsonlLogger, Throughput
from whvi_tpu.utils.profiling import (
    V5E_HBM_GBPS,
    chain_time,
    elbo_step_flops,
    fwht_flops,
    net_train_step_flops,
    v5e_peak_flops,
    whvi_layer_fwd_flops,
    whvi_layer_train_flops,
    whvi_mul_flops,
)

__all__ = [
    "JsonlLogger",
    "Throughput",
    "V5E_HBM_GBPS",
    "chain_time",
    "elbo_step_flops",
    "fwht_flops",
    "net_train_step_flops",
    "v5e_peak_flops",
    "whvi_layer_fwd_flops",
    "whvi_layer_train_flops",
    "whvi_mul_flops",
]
