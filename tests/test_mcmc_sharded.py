"""Mesh-sharded MCMC chains: the sampler rides the same SPMD machinery
as training (round-3 VERDICT missing #3 / SURVEY section 7.7)."""

import numpy as np
import jax
import jax.numpy as jnp

from whvi_tpu.mcmc import (
    HMCConfig,
    NUTSConfig,
    hmc_sample_chains,
    nuts_sample_chains,
)
from whvi_tpu.parallel import make_mesh


def _logp(q):
    # correlated 2-D Gaussian: log p = -0.5 q^T P q
    prec = jnp.array([[2.0, 0.6], [0.6, 1.0]])
    return -0.5 * q["x"] @ prec @ q["x"]


def _init():
    return {"x": jnp.zeros(2)}


def test_nuts_sharded_chains_match_vmapped():
    # The mesh-sharded chain set must be the vmapped chain set,
    # partitioned: per-chain equality of every sample and stat leaf
    # (up to f32 compile-path divergence: the jitted vmap and
    # shard_map programs schedule reductions differently).
    mesh = make_mesh(data=2, sample=4)
    cfg = NUTSConfig(n_warmup=20, n_samples=30, max_tree_depth=4)
    key = jax.random.PRNGKey(0)
    s_v, st_v = nuts_sample_chains(_logp, _init(), key, cfg, n_chains=8)
    s_m, st_m = nuts_sample_chains(
        _logp, _init(), key, cfg, n_chains=8, mesh=mesh
    )
    for a, b in zip(jax.tree.leaves(s_v), jax.tree.leaves(s_m)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )
    for a, b in zip(jax.tree.leaves(st_v), jax.tree.leaves(st_m)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_hmc_sharded_chains_match_vmapped():
    mesh = make_mesh(data=2, sample=4)
    cfg = HMCConfig(n_warmup=20, n_samples=30, n_leapfrog=8)
    key = jax.random.PRNGKey(1)
    s_v, st_v = hmc_sample_chains(_logp, _init(), key, cfg, n_chains=8)
    s_m, st_m = hmc_sample_chains(
        _logp, _init(), key, cfg, n_chains=8, mesh=mesh
    )
    for a, b in zip(jax.tree.leaves(s_v), jax.tree.leaves(s_m)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_sharded_chains_validates_divisibility():
    import pytest

    mesh = make_mesh(data=2, sample=4)
    with pytest.raises(ValueError, match="multiple"):
        nuts_sample_chains(
            _logp, _init(), jax.random.PRNGKey(0), NUTSConfig(
                n_warmup=2, n_samples=2, max_tree_depth=3
            ), n_chains=6, mesh=mesh,
        )


def test_sharded_chains_whvi_posterior():
    # End-to-end: the WHVI g-posterior (log_prob closes over replicated
    # data and trained params) sampled across the mesh.
    from whvi_tpu.mcmc import make_whvi_g_log_posterior
    from whvi_tpu.models import WHVILinear, WHVIRegression, relu

    net = WHVIRegression(
        [WHVILinear(4, 8, lambda_=1.0), relu, WHVILinear(8, 1)],
        train_samples=2,
        eval_samples=4,
    )
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(16, 4), jnp.float32)
    y = jnp.asarray(rng.randn(16, 1), jnp.float32)
    params = net.init(jax.random.PRNGKey(0))
    logp, init = make_whvi_g_log_posterior(net, params, X, y)
    mesh = make_mesh(data=2, sample=4)
    cfg = NUTSConfig(n_warmup=10, n_samples=10, max_tree_depth=4)
    s, st = nuts_sample_chains(
        logp, init, jax.random.PRNGKey(2), cfg, n_chains=8, mesh=mesh
    )
    for leaf in jax.tree.leaves(s):
        assert np.isfinite(np.asarray(leaf)).all()


def test_dense_mass_composes_with_sharded_chains():
    # dense metric + mesh-sharded chain axis must equal the vmapped
    # dense run per chain.
    cfg = NUTSConfig(
        n_warmup=20, n_samples=20, max_tree_depth=4, dense_mass=True
    )
    mesh = make_mesh(data=2, sample=4)
    key = jax.random.PRNGKey(5)
    s_v, _ = nuts_sample_chains(_logp, _init(), key, cfg, n_chains=8)
    s_m, _ = nuts_sample_chains(
        _logp, _init(), key, cfg, n_chains=8, mesh=mesh
    )
    for a, b in zip(jax.tree.leaves(s_v), jax.tree.leaves(s_m)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )
