"""Tests for the structured variational weight matrices.

Includes the *structural* oracle the reference lacks (SURVEY.md section 4):
sampled W must equal dense ``diag(s1) H diag(g) H diag(s2)`` with matched
PRNG, and the LRT path must agree with the explicit-sample path in
distribution (matched noise) and expectation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whvi_tpu.models import (
    ColumnMatrix,
    SquarePow2Matrix,
    StackedMatrix,
    setup_dimensions,
)
from whvi_tpu.ops import build_H, whvi_dense


def test_setup_dimensions_reference_cases():
    # Execution-verified reference behavior (SURVEY.md section 0):
    assert setup_dimensions(3, 16) == (4, 16, 1, 4)
    assert setup_dimensions(13, 128) == (16, 128, 3, 8)
    assert setup_dimensions(128, 128) == (128, 128, 0, 1)
    assert setup_dimensions(8, 10) == (8, 16, 0, 2)


def test_square_init_distributions():
    m = SquarePow2Matrix(256, lambda_=3.0)
    p = m.init(jax.random.PRNGKey(0))
    assert p["s1"].shape == (256,)
    # s1, s2 ~ 0.01 N(0,1) (reference weights.py:29-30)
    assert float(jnp.std(p["s1"])) < 0.02
    assert float(jnp.std(p["s2"])) < 0.02
    np.testing.assert_array_equal(np.asarray(p["g_mu"]), 0.0)
    # g_rho ~ U(-3, -2) (reference weights.py:32)
    assert float(p["g_rho"].min()) >= -3.0
    assert float(p["g_rho"].max()) <= -2.0


def test_square_sample_W_matches_structural_oracle():
    D = 32
    m = SquarePow2Matrix(D, lambda_=1.0)
    p = m.init(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    W = m.sample_W(p, key)
    g = m.sample_g(p, key)
    H = np.asarray(build_H(D))
    expect = (
        np.diag(np.asarray(p["s1"]))
        @ H
        @ np.diag(np.asarray(g))
        @ H
        @ np.diag(np.asarray(p["s2"]))
    )
    np.testing.assert_allclose(np.asarray(W), expect, rtol=1e-4, atol=1e-5)
    # and it is NOT diagonal (guards the reference's degeneracy bug)
    off = np.asarray(W) - np.diag(np.diag(np.asarray(W)))
    assert np.abs(off).max() > 1e-6


def test_square_apply_explicit_matches_dense_product():
    D, B = 16, 7
    m = SquarePow2Matrix(D)
    p = m.init(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, D))
    y = m.apply(p, x, key, lrt=False)
    W = m.sample_W(p, key)  # same key => same g sample
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) @ np.asarray(W).T, rtol=1e-4, atol=1e-5
    )


def test_square_lrt_matches_explicit_with_matched_noise():
    # LRT: y = x W_bar(mu)^T + x W_bar(sigma*eps)^T equals the explicit
    # path x W_bar(mu + sigma*eps)^T for the SAME eps, by linearity of
    # W_bar in its diagonal argument (reference weights.py:87-93).
    D, B = 32, 5
    m = SquarePow2Matrix(D)
    p = m.init(jax.random.PRNGKey(6))
    x = jax.random.normal(jax.random.PRNGKey(7), (B, D))
    key = jax.random.PRNGKey(8)
    y_lrt = m.apply(p, x, key, lrt=True)
    # reproduce the explicit path with the identical eps draw
    eps = jax.random.normal(key, (D,))
    g = p["g_mu"] + jax.nn.softplus(p["g_rho"]) * eps
    y_explicit = jnp.einsum(
        "ij,bj->bi", whvi_dense(p["s1"], g, p["s2"]), x
    )
    np.testing.assert_allclose(
        np.asarray(y_lrt), np.asarray(y_explicit), rtol=1e-4, atol=1e-5
    )


def test_square_kl_positive_and_zero_at_prior():
    D = 16
    m = SquarePow2Matrix(D, lambda_=2.0)
    p = m.init(jax.random.PRNGKey(9))
    assert float(m.kl(p)) > 0.0
    # posterior == prior => KL == 0
    import math

    rho_at_prior = math.log(math.expm1(math.sqrt(2.0)))
    p0 = {
        "s1": p["s1"],
        "s2": p["s2"],
        "g_mu": jnp.zeros((D,)),
        "g_rho": jnp.full((D,), rho_at_prior),
    }
    assert abs(float(m.kl(p0))) < 1e-4


@pytest.mark.parametrize("n_in,n_out", [(3, 16), (13, 20), (8, 10), (16, 16)])
def test_stacked_matches_blockwise_oracle(n_in, n_out):
    m = StackedMatrix(n_in, n_out, lambda_=1.0)
    p = m.init(jax.random.PRNGKey(10))
    key = jax.random.PRNGKey(11)
    B = 6
    x = jax.random.normal(jax.random.PRNGKey(12), (B, n_in))
    y = m.apply(p, x, key, lrt=False)
    assert y.shape == (B, n_out)
    W = m.sample_W(p, key)
    assert W.shape == (n_out, n_in)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) @ np.asarray(W).T, rtol=1e-4, atol=1e-4
    )


def test_stacked_lrt_runs_and_matches_matched_noise():
    n_in, n_out, B = 13, 20, 4
    m = StackedMatrix(n_in, n_out)
    p = m.init(jax.random.PRNGKey(13))
    key = jax.random.PRNGKey(14)
    x = jax.random.normal(jax.random.PRNGKey(15), (B, n_in))
    y_lrt = m.apply(p, x, key, lrt=True)
    assert y_lrt.shape == (B, n_out)
    eps = jax.random.normal(key, p["g_mu"].shape)
    g = p["g_mu"] + jax.nn.softplus(p["g_rho"]) * eps
    D_in, D_out, _, _ = m.dims
    W_blocks = whvi_dense(p["s1"], g, p["s2"])
    W = np.asarray(W_blocks).reshape(D_out, D_in)[:n_out, :n_in]
    np.testing.assert_allclose(
        np.asarray(y_lrt), np.asarray(x) @ W.T, rtol=1e-4, atol=1e-4
    )


def test_stacked_kl_equals_sum_of_blocks():
    m = StackedMatrix(8, 24, lambda_=0.5)
    p = m.init(jax.random.PRNGKey(16))
    total = float(m.kl(p))
    block = SquarePow2Matrix(8, lambda_=0.5)
    per = sum(
        float(block.kl(jax.tree.map(lambda a: a[i], p)))
        for i in range(p["g_mu"].shape[0])
    )
    np.testing.assert_allclose(total, per, rtol=1e-5)


@pytest.mark.parametrize("n", [5, 16, 20])
def test_column_matches_full_dense_truncation(n):
    m = ColumnMatrix(n, lambda_=1.0)
    p = m.init(jax.random.PRNGKey(17))
    key = jax.random.PRNGKey(18)
    col = m.sample_column(p, key)
    # oracle: full dense sample, flattened row-major, first n entries
    # (reference src/weights.py:244-248)
    block = SquarePow2Matrix(m.D_adj, lambda_=1.0)
    W_full = block.sample_W(p, key)
    np.testing.assert_allclose(
        np.asarray(col),
        np.asarray(W_full).reshape(-1)[:n],
        rtol=1e-4,
        atol=1e-5,
    )


def test_column_forward_shapes_and_values():
    n, B = 10, 4
    m = ColumnMatrix(n)
    p = m.init(jax.random.PRNGKey(19))
    key = jax.random.PRNGKey(20)
    x = jax.random.normal(jax.random.PRNGKey(21), (B, 1))
    y = m.apply(p, x, key)
    assert y.shape == (B, n)
    col = m.sample_column(p, key)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) * np.asarray(col)[None, :], rtol=1e-5
    )
    # transposed: n inputs -> 1 output
    mt = ColumnMatrix(n, transposed=True)
    pt = mt.init(jax.random.PRNGKey(22))
    xt = jax.random.normal(jax.random.PRNGKey(23), (B, n))
    yt = mt.apply(pt, xt, key)
    assert yt.shape == (B, 1)
    colt = mt.sample_column(pt, key)
    np.testing.assert_allclose(
        np.asarray(yt)[:, 0],
        np.asarray(xt) @ np.asarray(colt),
        rtol=1e-4,
        atol=1e-5,
    )


def test_gradients_flow_through_all_params():
    D = 16
    m = SquarePow2Matrix(D)
    p = m.init(jax.random.PRNGKey(24))
    x = jax.random.normal(jax.random.PRNGKey(25), (3, D))

    def loss(params):
        y = m.apply(params, x, jax.random.PRNGKey(26), lrt=True)
        return jnp.sum(jnp.square(y)) + m.kl(params)

    grads = jax.grad(loss)(p)
    for name in ("s1", "s2", "g_mu", "g_rho"):
        assert float(jnp.abs(grads[name]).max()) > 0.0, name


def test_per_example_lrt_noise():
    # per-example noise: same marginal mean as shared-noise LRT, but
    # outputs differ across batch rows even for identical inputs
    D, B = 16, 4
    m = SquarePow2Matrix(D)
    p = m.init(jax.random.PRNGKey(30))
    x = jnp.tile(jax.random.normal(jax.random.PRNGKey(31), (1, D)), (B, 1))
    key = jax.random.PRNGKey(32)
    y_shared = m.apply(p, x, key, lrt=True, per_example_noise=False)
    y_per = m.apply(p, x, key, lrt=True, per_example_noise=True)
    # shared: identical rows for identical inputs
    np.testing.assert_allclose(
        np.asarray(y_shared[0]), np.asarray(y_shared[1]), rtol=1e-6
    )
    # per-example: rows differ
    assert np.abs(np.asarray(y_per[0]) - np.asarray(y_per[1])).max() > 1e-4
    # stacked path too
    sm = StackedMatrix(5, 12)
    ps = sm.init(jax.random.PRNGKey(33))
    xs = jnp.tile(jax.random.normal(jax.random.PRNGKey(34), (1, 5)), (B, 1))
    y_per_s = sm.apply(ps, xs, key, lrt=True, per_example_noise=True)
    assert np.abs(np.asarray(y_per_s[0]) - np.asarray(y_per_s[1])).max() > 1e-5


def test_column_lrt_matches_explicit_marginals():
    # The column is linear in g, so the per-example LRT column must
    # (a) reproduce column_given_g exactly for batched g, and (b) give
    # independent per-row columns while the explicit path shares one
    # draw across the batch (round-4 opt-in, weights.ColumnMatrix).
    from whvi_tpu.models.weights import ColumnMatrix

    D = 16
    m_exp = ColumnMatrix(D, lambda_=1.0, transposed=True)
    m_lrt = ColumnMatrix(D, lambda_=1.0, transposed=True, use_lrt=True)
    params = m_exp.init(jax.random.PRNGKey(0))
    # batched column_given_g == per-row loop
    g = jax.random.normal(jax.random.PRNGKey(1), (5, D))
    batched = m_exp.column_given_g(params, g)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(batched[i]),
            np.asarray(m_exp.column_given_g(params, g[i])),
            rtol=1e-6,
            atol=1e-10,
        )
    x = jax.random.normal(jax.random.PRNGKey(2), (6, D))
    key = jax.random.PRNGKey(3)
    y_exp = m_exp.apply(params, x, key, lrt=True, per_example_noise=True)
    y_lrt = m_lrt.apply(params, x, key, lrt=True, per_example_noise=True)
    assert y_exp.shape == y_lrt.shape == (6, 1)
    # without the opt-in the flags are ignored (reference-faithful)
    y_exp2 = m_exp.apply(params, x, key, lrt=False)
    np.testing.assert_allclose(np.asarray(y_exp), np.asarray(y_exp2))
    # sample-mean of both estimators converges to the same mean output
    keys = jax.random.split(jax.random.PRNGKey(4), 4000)
    mean_exp = np.mean(
        np.asarray(
            jax.vmap(lambda k: m_exp.apply(params, x, k))(keys)
        ),
        axis=0,
    )
    mean_lrt = np.mean(
        np.asarray(
            jax.vmap(
                lambda k: m_lrt.apply(
                    params, x, k, lrt=True, per_example_noise=True
                )
            )(keys)
        ),
        axis=0,
    )
    np.testing.assert_allclose(mean_exp, mean_lrt, atol=5e-3)


def test_column_lrt_variance_reduced_loss():
    # With per-example noise the batch-mean output variance across keys
    # must shrink (the point of the estimator).
    from whvi_tpu.models.weights import ColumnMatrix

    D = 64
    m_exp = ColumnMatrix(D, lambda_=1.0, transposed=True)
    m_lrt = ColumnMatrix(D, lambda_=1.0, transposed=True, use_lrt=True)
    params = m_exp.init(jax.random.PRNGKey(0))
    params = dict(params, g_rho=jnp.zeros((D,)))  # sigma ~ 0.69: real noise
    x = jax.random.normal(jax.random.PRNGKey(2), (32, D))
    keys = jax.random.split(jax.random.PRNGKey(5), 512)
    # batch-mean of a NONLINEAR per-row statistic (squared output — the
    # shape of a log-likelihood term): with one shared draw it does not
    # average out; with independent per-row draws it concentrates ~B x.
    out_exp = jax.vmap(
        lambda k: jnp.mean(jnp.square(m_exp.apply(params, x, k)))
    )(keys)
    out_lrt = jax.vmap(
        lambda k: jnp.mean(
            jnp.square(
                m_lrt.apply(params, x, k, lrt=True, per_example_noise=True)
            )
        )
    )(keys)
    # on random inputs the rows are only weakly correlated even with a
    # shared draw, so the measured gain here is ~2x (it grows with D:
    # 5.6x at D=1024, benchmarks/column_lrt_check.py); the structural
    # check is the cross-row decorrelation
    assert float(jnp.var(out_lrt)) < 0.7 * float(jnp.var(out_exp))
    ye = jax.vmap(lambda k: m_exp.apply(params, x, k))(keys)[:, :, 0]
    yl = jax.vmap(
        lambda k: m_lrt.apply(
            params, x, k, lrt=True, per_example_noise=True
        )
    )(keys)[:, :, 0]
    ce = np.abs(np.corrcoef(np.asarray(ye).T) - np.eye(32)).mean()
    cl = np.abs(np.corrcoef(np.asarray(yl).T) - np.eye(32)).mean()
    assert cl < 0.3 * ce  # independent per-row draws decorrelate rows
