"""Parallel-tempering tests: exactness on a Gaussian, mode-hopping on a
bimodal target that provably defeats plain HMC, chain-driver API."""

import numpy as np
import jax
import jax.numpy as jnp

from whvi_tpu.mcmc import (
    HMCConfig,
    PTConfig,
    hmc_sample,
    moments,
    pt_sample,
    pt_sample_chains,
    split_rhat,
)


def test_pt_cold_rung_recovers_gaussian_moments():
    # unimodal sanity: tempering must not bias the cold rung
    mean = jnp.array([1.0, -2.0, 0.5])
    sd = jnp.array([0.5, 2.0, 1.0])

    def logp(q):
        return jnp.sum(-0.5 * jnp.square((q["x"] - mean) / sd))

    cfg = PTConfig(
        n_samples=2000, n_warmup=600, n_rungs=4, n_leapfrog=12
    )
    samples, stats = pt_sample(
        logp, {"x": jnp.zeros(3)}, jax.random.PRNGKey(0), cfg
    )
    m, s = moments(samples)
    assert float(stats["accept_rate"][0]) > 0.5
    np.testing.assert_allclose(np.asarray(m["x"]), np.asarray(mean), atol=0.2)
    np.testing.assert_allclose(np.asarray(s["x"]), np.asarray(sd), rtol=0.3)
    # every adjacent pair must actually exchange
    assert np.all(np.asarray(stats["swap_rate"]) > 0.1)


def _bimodal_logp(q):
    # symmetric modes at +-3 with sd 0.3: the barrier at 0 is
    # 0.5 * (3 / 0.3)^2 = 50 nats — exp(-50), unreachable for any
    # single-temperature trajectory at the mode-scale step size
    x = q["x"]
    a = -0.5 * jnp.sum(jnp.square((x - 3.0) / 0.3))
    b = -0.5 * jnp.sum(jnp.square((x + 3.0) / 0.3))
    return jnp.logaddexp(a, b)


def test_pt_crosses_the_barrier_plain_hmc_cannot():
    init = {"x": jnp.full((2,), 3.0)}  # start in the + mode

    # plain HMC: provably stuck in the start mode
    h_samples, _ = hmc_sample(
        _bimodal_logp,
        init,
        jax.random.PRNGKey(1),
        HMCConfig(n_samples=1500, n_warmup=500, n_leapfrog=16),
    )
    h_sign = np.asarray(h_samples["x"][:, 0]) < 0
    assert h_sign.mean() == 0.0  # never visits the - mode

    # tempering: beta_min = 0.02 flattens the 50-nat barrier to 1 nat
    cfg = PTConfig(
        n_samples=2000,
        n_warmup=1000,
        n_rungs=10,
        beta_min=0.02,
        n_leapfrog=8,
        init_step_size=0.1,
        # multimodal cold rung: the adapted (unimodal-assumption) mass
        # covers the BIMODAL spread while local curvature is 10x
        # tighter, so run conservatively to keep the energy error down
        target_accept=0.9,
    )
    samples, stats = pt_sample(
        _bimodal_logp, init, jax.random.PRNGKey(2), cfg
    )
    frac_neg = float(np.mean(np.asarray(samples["x"][:, 0]) < 0))
    # cold rung visits BOTH modes in roughly equal proportion
    assert 0.2 < frac_neg < 0.8
    assert np.all(np.asarray(stats["swap_rate"]) > 0.05)
    # divergent proposals are rejected (never kept); a stray rejection
    # on a multimodal target is tolerable, a rash is not
    assert int(stats["divergences"]) <= 2


def test_pt_chains_driver_and_diagnostics():
    mean = jnp.array([0.5, -1.0])

    def logp(q):
        return jnp.sum(-0.5 * jnp.square(q["x"] - mean))

    cfg = PTConfig(n_samples=800, n_warmup=400, n_rungs=4, n_leapfrog=8)
    samples, stats = pt_sample_chains(
        logp, {"x": jnp.zeros(2)}, jax.random.PRNGKey(3), cfg, n_chains=2
    )
    assert samples["x"].shape == (2, 800, 2)
    assert stats["swap_rate"].shape == (2, 3)
    rhat = float(jnp.max(split_rhat(samples["x"])))
    assert rhat < 1.05


def test_chains_jittered_inits_with_rbg_keys():
    # jittered_inits used to hard-code the threefry raw-key width
    # (reshape(..., 2)), breaking jittered chain starts under any other
    # PRNG impl (typed rbg keys here; raw rbg keys are (4,))
    from whvi_tpu.mcmc import NUTSConfig, nuts_sample_chains

    def logp(q):
        return jnp.sum(-0.5 * jnp.square(q["x"]))

    cfg = NUTSConfig(n_samples=30, n_warmup=30, max_tree_depth=3)
    s, _ = nuts_sample_chains(
        logp,
        {"x": jnp.zeros(2)},
        jax.random.key(0, impl="rbg"),
        cfg,
        n_chains=2,
        jitter=0.5,
    )
    assert s["x"].shape == (2, 30, 2)
    assert bool(jnp.isfinite(s["x"]).all())
