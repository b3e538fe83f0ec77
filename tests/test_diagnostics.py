"""MCMC diagnostics tests: ESS, split-R-hat, divergences, multi-chain.

Round-2 additions (VERDICT.md missing #3): the golden-sampler claim is
only falsifiable with convergence diagnostics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whvi_tpu.mcmc import (
    HMCConfig,
    ess,
    hmc_sample_chains,
    nuts_sample_chains,
    NUTSConfig,
    split_rhat,
    summarize,
)


def _iid_chains(C=4, N=2000, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(C, N), jnp.float32)


def test_ess_iid_near_total():
    chains = _iid_chains()
    n_eff = float(ess(chains))
    total = chains.shape[0] * chains.shape[1]
    assert 0.5 * total <= n_eff <= total + 1


def test_ess_autocorrelated_much_smaller():
    # AR(1) with phi = 0.95: true ESS factor (1-phi)/(1+phi) ~ 0.026
    rng = np.random.RandomState(1)
    C, N, phi = 4, 2000, 0.95
    x = np.zeros((C, N), np.float32)
    for t in range(1, N):
        x[:, t] = phi * x[:, t - 1] + rng.randn(C) * np.sqrt(1 - phi**2)
    n_eff = float(ess(jnp.asarray(x)))
    assert n_eff < 0.15 * C * N  # far below the iid count
    assert n_eff > 10.0


def test_split_rhat_mixed_chains_near_one():
    r = float(split_rhat(_iid_chains()))
    assert abs(r - 1.0) < 0.02


def test_split_rhat_detects_disagreeing_chains():
    chains = np.array(_iid_chains())  # writable copy
    chains[0] += 3.0  # one chain stuck in a different mode
    r = float(split_rhat(jnp.asarray(chains)))
    assert r > 1.5


def test_split_rhat_detects_trending_chain():
    # within-chain drift: split halves disagree
    N = 2000
    trend = np.linspace(0, 4, N, dtype=np.float32)
    chains = np.asarray(_iid_chains()) + trend[None, :]
    r = float(split_rhat(jnp.asarray(chains)))
    assert r > 1.2


def test_ess_param_shapes():
    rng = np.random.RandomState(2)
    chains = jnp.asarray(rng.randn(4, 500, 3, 2), jnp.float32)
    assert ess(chains).shape == (3, 2)
    assert split_rhat(chains).shape == (3, 2)


def test_multichain_hmc_gaussian_converges():
    mean = jnp.array([1.0, -2.0, 0.5])
    sd = jnp.array([0.5, 2.0, 1.0])

    def logp(q):
        return jnp.sum(-0.5 * jnp.square((q["x"] - mean) / sd))

    cfg = HMCConfig(n_samples=1000, n_warmup=400, n_leapfrog=16)
    samples, stats = hmc_sample_chains(
        logp, {"x": jnp.zeros(3)}, jax.random.PRNGKey(0), cfg, n_chains=4
    )
    assert samples["x"].shape == (4, 1000, 3)
    assert stats["divergences"].shape == (4,)
    assert int(jnp.sum(stats["divergences"])) == 0
    r = split_rhat(samples["x"])
    assert float(jnp.max(r)) < 1.05
    n_eff = ess(samples["x"])
    assert float(jnp.min(n_eff)) > 100.0
    table = summarize(samples)
    (row,) = table.values()
    np.testing.assert_allclose(row["mean"], float(mean.mean()), atol=0.2)


def test_multichain_nuts_gaussian_converges():
    mean = jnp.array([0.5, -1.0])
    sd = jnp.array([1.0, 0.3])

    def logp(q):
        return jnp.sum(-0.5 * jnp.square((q["x"] - mean) / sd))

    cfg = NUTSConfig(n_samples=600, n_warmup=300, max_tree_depth=5)
    samples, stats = nuts_sample_chains(
        logp, {"x": jnp.zeros(2)}, jax.random.PRNGKey(1), cfg, n_chains=4
    )
    assert samples["x"].shape == (4, 600, 2)
    assert int(jnp.sum(stats["divergences"])) == 0
    assert float(jnp.max(split_rhat(samples["x"]))) < 1.05
    assert float(jnp.min(ess(samples["x"]))) > 100.0
    m = np.asarray(jnp.mean(samples["x"], axis=(0, 1)))
    np.testing.assert_allclose(m, np.asarray(mean), atol=0.15)


def test_hmc_divergence_detected_on_pathological_target():
    # A target with an extreme scale cliff + huge step size forces
    # Hamiltonian blow-ups that must be counted.
    def logp(q):
        x = q["x"]
        return -0.5 * jnp.sum(jnp.square(x) * jnp.exp(10.0 * x))

    cfg = HMCConfig(
        n_samples=100,
        n_warmup=0,
        n_leapfrog=32,
        init_step_size=1.0,
        adapt=False,
    )
    samples, stats = hmc_sample_chains(
        logp, {"x": jnp.ones(2) * 2.0}, jax.random.PRNGKey(2), cfg,
        n_chains=2, jitter=0.0,
    )
    assert int(jnp.sum(stats["divergences"])) > 0
