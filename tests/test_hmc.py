"""HMC golden-sampler tests: exactness on Gaussians, WHVI posterior
sampling, VI-vs-HMC moment validation on a conjugate-ish toy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whvi_tpu.mcmc import (
    HMCConfig,
    hmc_sample,
    make_whvi_g_log_posterior,
    moments,
)
from whvi_tpu.models import WHVILinear, WHVIRegression, relu


def test_hmc_recovers_gaussian_moments():
    # target: N(mean, diag(sd^2)) in 3-D
    mean = jnp.array([1.0, -2.0, 0.5])
    sd = jnp.array([0.5, 2.0, 1.0])

    def logp(q):
        return jnp.sum(-0.5 * jnp.square((q["x"] - mean) / sd))

    cfg = HMCConfig(n_samples=2000, n_warmup=500, n_leapfrog=16)
    samples, stats = hmc_sample(
        logp, {"x": jnp.zeros(3)}, jax.random.PRNGKey(0), cfg
    )
    m, s = moments(samples)
    assert float(stats["accept_rate"]) > 0.5
    np.testing.assert_allclose(np.asarray(m["x"]), np.asarray(mean), atol=0.15)
    np.testing.assert_allclose(np.asarray(s["x"]), np.asarray(sd), rtol=0.25)


def test_hmc_correlated_gaussian():
    cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(q):
        return -0.5 * q["x"] @ prec @ q["x"]

    cfg = HMCConfig(n_samples=3000, n_warmup=500, n_leapfrog=24)
    samples, stats = hmc_sample(
        logp, {"x": jnp.zeros(2)}, jax.random.PRNGKey(1), cfg
    )
    xs = np.asarray(samples["x"])
    emp_cov = np.cov(xs.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.2)


def test_hmc_step_size_adaptation():
    def logp(q):
        return jnp.sum(-0.5 * jnp.square(q["x"]) / 0.01)  # tight target

    # mass_adapt off: this test isolates the dual-averaging mechanism
    # (with the adapted metric the optimal eps is no longer < 0.5 --
    # the mass matrix absorbs the 0.1 target scale)
    cfg = HMCConfig(
        n_samples=300, n_warmup=500, n_leapfrog=8, init_step_size=0.5,
        mass_adapt=False,
    )
    _, stats = hmc_sample(
        logp, {"x": jnp.zeros(4)}, jax.random.PRNGKey(2), cfg
    )
    # adaptation must bring the post-warmup acceptance near the target
    assert 0.5 < float(stats["accept_rate"]) <= 1.0
    assert float(stats["step_size"]) < 0.5


def test_whvi_g_log_posterior_runs_and_samples():
    rng = np.random.RandomState(0)
    X = rng.randn(40, 4).astype(np.float32)
    y = (X.sum(axis=1, keepdims=True) + 0.1 * rng.randn(40, 1)).astype(
        np.float32
    )
    net = WHVIRegression(
        [WHVILinear(4, 8, lambda_=1.0), relu, WHVILinear(8, 1, lambda_=1.0)],
        eval_samples=4,
    )
    params = net.init(jax.random.PRNGKey(3))
    logp, init = make_whvi_g_log_posterior(net, params, X, y)
    # layers 0 and 2 are Bayesian
    assert set(init.keys()) == {0, 2}
    val = float(logp(init))
    assert np.isfinite(val)
    cfg = HMCConfig(n_samples=100, n_warmup=100, n_leapfrog=8)
    samples, stats = hmc_sample(logp, init, jax.random.PRNGKey(4), cfg)
    assert float(stats["accept_rate"]) > 0.2
    m, s = moments(samples)
    for i in (0, 2):
        assert np.all(np.isfinite(np.asarray(m[i])))
        assert np.all(np.asarray(s[i]) >= 0)


def test_vi_vs_hmc_moments_linear_gaussian():
    # Single WHVILinear(4,4) + Gaussian likelihood: the g-posterior is
    # exactly Gaussian (model linear in g), so HMC moments are exact and
    # a well-trained VI should land near them. Here we just verify the
    # HMC machinery: analytic posterior for a linear-Gaussian model
    # y = A g + eps,  A[i, :] = s1_i * H_i. diag-prior vs HMC.
    from whvi_tpu.ops import build_H

    rng = np.random.RandomState(1)
    D = 4
    s1 = rng.randn(D).astype(np.float32)
    s2 = rng.randn(D).astype(np.float32)
    H = np.asarray(build_H(D))
    g_true = rng.randn(D).astype(np.float32)
    X = rng.randn(60, D).astype(np.float32)
    W = np.diag(s1) @ H @ np.diag(g_true) @ H @ np.diag(s2)
    sigma = 0.1
    y = X @ W.T + sigma * rng.randn(60, D).astype(np.float32)

    # design matrix for vec model: y_b = M_b g with
    # M_b[i, k] = s1_i H_ik (H s2 x_b)_k
    lam = 10.0
    Hs2x = (X * s2[None, :]) @ H  # (B, D)
    M = s1[None, :, None] * H[None, :, :] * Hs2x[:, None, :]  # (B, D, D)
    M2 = M.reshape(-1, D)
    yv = y.reshape(-1)
    prec = np.eye(D) / lam + M2.T @ M2 / sigma**2
    cov = np.linalg.inv(prec)
    mean = cov @ (M2.T @ yv) / sigma**2

    def logp(q):
        g = q["g"]
        pred = jnp.einsum("bik,k->bi", jnp.asarray(M), g)
        r = jnp.asarray(y) - pred
        return (
            -0.5 * jnp.sum(jnp.square(r)) / sigma**2
            - 0.5 * jnp.sum(jnp.square(g)) / lam
        )

    cfg = HMCConfig(n_samples=3000, n_warmup=500, n_leapfrog=16)
    samples, _ = hmc_sample(
        logp, {"g": jnp.zeros(D)}, jax.random.PRNGKey(5), cfg
    )
    m, s = moments(samples)
    np.testing.assert_allclose(np.asarray(m["g"]), mean, atol=0.05)
    np.testing.assert_allclose(
        np.asarray(s["g"]), np.sqrt(np.diag(cov)), rtol=0.3
    )


def test_chain_driver_cache_survives_fresh_closures():
    # Round-4 VERDICT weak #4: the driver cache was keyed on closure
    # identity, so rebuilding make_whvi_g_log_posterior before each
    # call (the natural pattern) silently recompiled the sampler
    # (165 vs 21,800 draws/s). StructuredLogProb keys on structure.
    from whvi_tpu.mcmc import NUTSConfig, nuts_sample_chains
    from whvi_tpu.mcmc import chains as chains_mod

    rng = np.random.RandomState(4)
    X = rng.randn(24, 4).astype(np.float32)
    y = X.sum(axis=1, keepdims=True).astype(np.float32)
    net = WHVIRegression([WHVILinear(4, 4, lambda_=1.0)], eval_samples=2)
    params = net.init(jax.random.PRNGKey(0))
    cfg = NUTSConfig(n_samples=20, n_warmup=20, max_tree_depth=3)

    chains_mod._JIT_CACHE.clear()
    logp1, init1 = make_whvi_g_log_posterior(net, params, X, y)
    s1, _ = nuts_sample_chains(
        logp1, init1, jax.random.PRNGKey(1), cfg, n_chains=2
    )
    assert len(chains_mod._JIT_CACHE) == 1
    # freshly-built but structurally identical posterior: cache HIT
    logp2, init2 = make_whvi_g_log_posterior(net, params, X, y)
    assert logp2 is not logp1
    s2, _ = nuts_sample_chains(
        logp2, init2, jax.random.PRNGKey(1), cfg, n_chains=2
    )
    assert len(chains_mod._JIT_CACHE) == 1
    np.testing.assert_allclose(np.asarray(s1[0]), np.asarray(s2[0]))
    # different DATA of the same shape: same compiled driver (data is a
    # jit argument, not a baked-in constant), different posterior
    logp3, init3 = make_whvi_g_log_posterior(net, params, X, y * 3.0)
    s3, _ = nuts_sample_chains(
        logp3, init3, jax.random.PRNGKey(1), cfg, n_chains=2
    )
    assert len(chains_mod._JIT_CACHE) == 1
    jitted = next(iter(chains_mod._JIT_CACHE.values()))
    assert jitted._cache_size() == 1  # ONE compile across all 3 calls
    assert not np.allclose(np.asarray(s1[0]), np.asarray(s3[0]))


def test_nuts_recovers_gaussian_moments():
    from whvi_tpu.mcmc.nuts import NUTSConfig, nuts_sample

    mean = jnp.array([1.0, -2.0, 0.5])
    sd = jnp.array([0.5, 2.0, 1.0])

    def logp(q):
        return jnp.sum(-0.5 * jnp.square((q["x"] - mean) / sd))

    cfg = NUTSConfig(n_samples=1500, n_warmup=500, max_tree_depth=5)
    samples, stats = nuts_sample(
        logp, {"x": jnp.zeros(3)}, jax.random.PRNGKey(7), cfg
    )
    m, s = moments(samples)
    assert float(stats["accept_stat"]) > 0.4
    np.testing.assert_allclose(np.asarray(m["x"]), np.asarray(mean), atol=0.2)
    np.testing.assert_allclose(np.asarray(s["x"]), np.asarray(sd), rtol=0.3)


def test_nuts_correlated_gaussian():
    from whvi_tpu.mcmc.nuts import NUTSConfig, nuts_sample

    cov = jnp.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(q):
        return -0.5 * q["x"] @ prec @ q["x"]

    cfg = NUTSConfig(n_samples=2000, n_warmup=500, max_tree_depth=6)
    samples, _ = nuts_sample(
        logp, {"x": jnp.zeros(2)}, jax.random.PRNGKey(8), cfg
    )
    emp_cov = np.cov(np.asarray(samples["x"]).T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.25)


def test_nuts_on_whvi_posterior():
    from whvi_tpu.mcmc.nuts import NUTSConfig, nuts_sample

    rng = np.random.RandomState(2)
    X = rng.randn(30, 4).astype(np.float32)
    y = (X.sum(axis=1, keepdims=True) + 0.1 * rng.randn(30, 1)).astype(
        np.float32
    )
    net = WHVIRegression(
        [WHVILinear(4, 8, lambda_=1.0), relu, WHVILinear(8, 1, lambda_=1.0)],
    )
    params = net.init(jax.random.PRNGKey(9))
    logp, init = make_whvi_g_log_posterior(net, params, X, y)
    cfg = NUTSConfig(n_samples=100, n_warmup=100, max_tree_depth=4)
    samples, stats = nuts_sample(logp, init, jax.random.PRNGKey(10), cfg)
    m, s = moments(samples)
    for i in init:
        assert np.all(np.isfinite(np.asarray(m[i])))
