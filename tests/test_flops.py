"""Analytic MXU flop-counter units (the MFU audit mechanism).

The counters feed the mfu columns of run_scaling / tpu_kernel_check /
bench.py; the convention is MXU matmul FLOPs only, with the merged-u
LRT counted as ONE fused product per layer per sample (it caught its
own first bug: a 2-product LRT count produced a >100%-MFU serving row,
sweeps/r3_tpu_queue1.log).
"""

from whvi_tpu.models import WHVILinear, WHVIRegression, relu
from whvi_tpu.utils import (
    elbo_step_flops,
    fwht_flops,
    net_train_step_flops,
    whvi_layer_fwd_flops,
    whvi_layer_train_flops,
    whvi_mul_flops,
)


def test_fwht_flops_formula():
    # D=256 factors as (128, 2): 2 * B * D * (128 + 2)
    assert fwht_flops(256, 32) == 2 * 32 * 256 * 130
    # D=16384 factors as (128, 128)
    assert fwht_flops(16384, 512) == 2 * 512 * 16384 * 256


def test_product_and_layer_counts():
    B, D = 64, 1024
    assert whvi_mul_flops(D, B) == 2 * fwht_flops(D, B)
    # merged-u LRT: forward is ONE product, lrt flag changes nothing
    assert whvi_layer_fwd_flops(D, B, lrt=True) == whvi_mul_flops(D, B)
    assert whvi_layer_fwd_flops(D, B, lrt=False) == whvi_mul_flops(D, B)
    # H constant => bwd == fwd, train = 2x
    assert whvi_layer_train_flops(D, B) == 2 * whvi_mul_flops(D, B)
    assert whvi_layer_train_flops(D, B, stack=4) == 8 * whvi_mul_flops(D, B)


def test_net_counter_matches_hand_count():
    net = WHVIRegression(
        [
            WHVILinear(3, 16),   # stacked: D_in=4, stack=4
            relu,
            WHVILinear(16, 16),  # square D=16
            relu,
            WHVILinear(16, 1),   # column: no matmul, excluded
        ],
        train_samples=2,
    )
    B = 64
    want = 2 * (
        whvi_layer_train_flops(4, B, stack=4)
        + whvi_layer_train_flops(16, B)
    )
    assert net_train_step_flops(net, B) == want
    assert elbo_step_flops([16], B, 2) == 2 * whvi_layer_train_flops(16, B)
