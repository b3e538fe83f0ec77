"""Pallas fused-kernel tests (interpret mode on CPU).

Oracle pattern mirrors reference test/walsh.py plus VJP checks against
the differentiable jnp formulation. Real-TPU execution of the same
kernels is covered by benchmarks/tpu_kernel_check.py (the driver's bench
runs on hardware; pytest runs on the CPU backend where only interpret
mode is available).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whvi_tpu.ops import build_H, whvi_mul, whvi_mul_dense_oracle
from whvi_tpu.ops.fwht_pallas import (
    _factor_pair,
    fwht_pallas,
    pallas_supported,
    whvi_mul_pallas,
)


def _rand(D, B, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    s1 = jax.random.normal(ks[0], (D,))
    u = jax.random.normal(ks[1], (D,))
    s2 = jax.random.normal(ks[2], (D,))
    x = jax.random.normal(ks[3], (B, D))
    return s1, u, s2, x


def test_factor_pair():
    assert _factor_pair(64) == (1, 64)
    assert _factor_pair(128) == (1, 128)
    assert _factor_pair(512) == (1, 512)
    assert _factor_pair(1024) == (1, 1024)
    assert _factor_pair(2048) == (16, 128)
    assert _factor_pair(4096) == (32, 128)
    assert _factor_pair(16384) == (128, 128)
    assert pallas_supported(8192)
    assert not pallas_supported(32768)
    assert not pallas_supported(96)


@pytest.mark.parametrize("D", [8, 64, 128, 512, 1024, 2048])
def test_fused_matches_jnp(D):
    s1, u, s2, x = _rand(D, B=24)
    got = whvi_mul_pallas(s1, u, s2, x, True, "fp32")
    want = whvi_mul(s1, u, s2, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-2
    )


def test_fused_matches_dense_oracle():
    D = 1024
    s1, u, s2, x = _rand(D, B=5, seed=1)
    got = whvi_mul_pallas(s1, u, s2, x, True, "fp32")
    want = whvi_mul_dense_oracle(s1, u, s2, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=1e-2
    )


@pytest.mark.parametrize("B", [3, 8, 100])
def test_fused_odd_batch_sizes(B):
    # batch not divisible by the tile: wrapper pads and slices
    D = 128
    s1, u, s2, x = _rand(D, B=B, seed=2)
    got = whvi_mul_pallas(s1, u, s2, x, True, "fp32")
    want = whvi_mul(s1, u, s2, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-2
    )


@pytest.mark.parametrize("D", [64, 1024])
def test_fused_vjp_matches_jnp_vjp(D):
    s1, u, s2, x = _rand(D, B=6, seed=3)
    g = jax.random.normal(jax.random.PRNGKey(9), x.shape)

    def f_pallas(s1, u, s2, x):
        return whvi_mul_pallas(s1, u, s2, x, True, "fp32")

    def f_jnp(s1, u, s2, x):
        return whvi_mul(s1, u, s2, x)

    out_p, vjp_p = jax.vjp(f_pallas, s1, u, s2, x)
    out_j, vjp_j = jax.vjp(f_jnp, s1, u, s2, x)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_j), rtol=5e-3, atol=1e-2
    )
    for gp, gj, name in zip(vjp_p(g), vjp_j(g), ("s1", "u", "s2", "x")):
        np.testing.assert_allclose(
            np.asarray(gp),
            np.asarray(gj),
            rtol=5e-3,
            atol=1e-2,
            err_msg=f"grad {name}",
        )


def test_fused_grad_of_scalar_loss():
    # end-to-end: grad of a scalar loss through the fused op matches the
    # jnp path (autodiff ground truth) — stronger than finite differences
    # in fp32.
    D = 128
    s1, u, s2, x = _rand(D, B=4, seed=4)

    def loss_p(s1, u, s2):
        return jnp.sum(jnp.tanh(whvi_mul_pallas(s1, u, s2, x, True, "fp32")))

    def loss_j(s1, u, s2):
        return jnp.sum(jnp.tanh(whvi_mul(s1, u, s2, x)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(s1, u, s2)
    gj = jax.grad(loss_j, argnums=(0, 1, 2))(s1, u, s2)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )


@pytest.mark.parametrize("D", [32, 128, 1024, 2048])
def test_fwht_pallas_matches_dense(D):
    # 2048 exercises the two-factor bare-transform kernel (natural ->
    # natural via two middle-axis contractions, zero transposes)
    x = jax.random.normal(jax.random.PRNGKey(5), (7, D))
    got = fwht_pallas(x, interpret=True)
    want = x @ np.asarray(build_H(D))
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("D", [128, 2048])
def test_fwht_pallas_grad_is_self_adjoint(D):
    # VJP of the bare transform is the transform itself (H = H^T)
    x = jax.random.normal(jax.random.PRNGKey(6), (3, D))
    g = jax.random.normal(jax.random.PRNGKey(7), (3, D))
    _, vjp = jax.vjp(lambda v: fwht_pallas(v, True), x)
    (dx,) = vjp(g)
    want = g @ np.asarray(build_H(D))
    np.testing.assert_allclose(
        np.asarray(dx), want, rtol=1e-4, atol=1e-3
    )


def test_whvi_mul_pallas_backend_dispatch():
    # Opt-in backend: whvi_mul routes eligible square products through the
    # fused kernel (interpret mode off-TPU) and must match the XLA path
    # within the kernel's bf16-operand tolerance; stacked (2-D diagonal)
    # calls fall back to XLA untouched.
    import numpy as np

    from whvi_tpu.ops import whvi_mul
    from whvi_tpu.ops.whvi_op import set_whvi_mul_backend

    D = 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    s1 = jax.random.normal(ks[0], (D,)) * 0.1
    u = jax.random.normal(ks[1], (D,)) * 0.1
    s2 = jax.random.normal(ks[2], (D,)) * 0.1
    x = jax.random.normal(ks[3], (5, D))
    ref = whvi_mul(s1, u, s2, x)
    try:
        set_whvi_mul_backend("pallas")
        y = whvi_mul(s1, u, s2, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), rtol=2e-2, atol=2e-3
        )
        # 3-D activations (vmap-like leading axis) reshape through
        y3 = whvi_mul(s1, u, s2, x.reshape(1, 5, D))
        np.testing.assert_allclose(
            np.asarray(y3[0]), np.asarray(ref), rtol=2e-2, atol=2e-3
        )
        # stacked diagonals: falls back to XLA exactly
        s1s = jnp.stack([s1, s1])
        us = jnp.stack([u, u])
        s2s = jnp.stack([s2, s2])
        ys = whvi_mul(s1s, us, s2s, x[:, None, :])
        np.testing.assert_allclose(
            np.asarray(ys[:, 0]), np.asarray(ref), rtol=1e-5, atol=1e-6
        )
    finally:
        set_whvi_mul_backend("auto")
    with __import__("pytest").raises(ValueError):
        set_whvi_mul_backend("cuda")


def test_auto_dispatch_table():
    # "auto" backend: the pinned measured-win dispatch rule. The table
    # is currently EMPTY: round-3's D=4096 1.09x niche did not
    # reproduce in round 4 (0.58-0.80x across two harnesses,
    # sweeps/r4_tpu_queue5.log), so auto == XLA everywhere. The rule
    # still hard-excludes vmapped calls (round-2 e2e: XLA 7.7x faster
    # on the vmapped train step) and non-TPU backends.
    from whvi_tpu.ops import whvi_op
    from whvi_tpu.ops.whvi_op import _auto_uses_pallas

    for D in (64, 1024, 2048, 4096, 8192, 16384, 32768):
        assert not _auto_uses_pallas(D, batched=False, on_tpu=True)
    # the guard structure (a future table entry dispatches only direct
    # on-TPU products)
    orig = whvi_op._PALLAS_AUTO_SHAPES
    try:
        whvi_op._PALLAS_AUTO_SHAPES = frozenset({4096})
        assert _auto_uses_pallas(4096, batched=False, on_tpu=True)
        assert not _auto_uses_pallas(4096, batched=True, on_tpu=True)
        assert not _auto_uses_pallas(4096, batched=False, on_tpu=False)
        assert not _auto_uses_pallas(2048, batched=False, on_tpu=True)
    finally:
        whvi_op._PALLAS_AUTO_SHAPES = orig


def test_auto_backend_matches_xla_numerics():
    # On the CPU test backend "auto" must be the XLA path bit-for-bit
    # (no regressions off the niche), including under vmap, and the
    # vmap-detection helper must see BatchTracers.
    import numpy as np

    from whvi_tpu.ops import whvi_mul
    from whvi_tpu.ops.whvi_op import _any_batched, set_whvi_mul_backend

    D = 64
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    s1, u, s2 = (jax.random.normal(k, (D,)) * 0.1 for k in ks[:3])
    x = jax.random.normal(ks[3], (4, D))
    set_whvi_mul_backend("xla")
    try:
        ref = jax.jit(whvi_mul)(s1, u, s2, x)
    finally:
        set_whvi_mul_backend("auto")
    got = jax.jit(whvi_mul)(s1, u, s2, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    seen = []

    def probe(xi):
        seen.append(_any_batched(xi))
        return whvi_mul(s1, u, s2, xi)

    got_v = jax.vmap(probe)(x[None])
    np.testing.assert_allclose(
        np.asarray(got_v[0]), np.asarray(ref), rtol=1e-6
    )
    assert seen == [True]
    assert not _any_batched(x)


def test_any_batched_detects_nested_tracers():
    # grad-of-vmap wraps the BatchTracer inside a JVPTracer: the auto
    # guard must still see it (round-4 review finding #3).
    import numpy as np

    from whvi_tpu.ops.whvi_op import _any_batched

    seen = []

    def inner(x):
        seen.append(_any_batched(x))
        return jnp.sum(x * x)

    x = jnp.arange(8.0).reshape(2, 4)
    jax.grad(lambda v: jnp.sum(jax.vmap(inner)(v)))(x)
    assert any(seen)
