"""Hamiltonian Monte Carlo golden sampler.

New capability over the reference (BASELINE.json north star): an exact
(asymptotically) posterior sampler in the same engine, used to validate
the VI posterior moments on small/frozen models. Pure JAX: leapfrog
integration over parameter pytrees, ``lax.scan`` over draws, dual
averaging step-size adaptation (Hoffman & Gelman 2014, Algorithm 5)
during warmup, identity mass matrix.

``make_whvi_g_log_posterior`` builds the unnormalized log posterior of
the stochastic WHVI diagonals ``g`` (one vector per Bayesian layer) with
all deterministic parameters (S1, S2, biases, likelihood noise) frozen
at their trained values — the exact distribution the variational
``q(g) = N(g_mu, diag(softplus(g_rho)^2))`` approximates, so VI moments
can be checked against HMC moments layer by layer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = [
    "HMCConfig",
    "hmc_sample",
    "hmc_sample_chains",
    "make_whvi_g_log_posterior",
    "moments",
]


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    n_samples: int = 1000
    n_warmup: int = 500
    n_leapfrog: int = 32
    init_step_size: float = 1e-2
    target_accept: float = 0.8
    adapt: bool = True


def _leapfrog(grad_fn, q, p, step_size, n_steps):
    """Standard leapfrog; q, p are pytrees."""

    def body(_, qp):
        q, p = qp
        g = grad_fn(q)
        p = jax.tree.map(lambda p_, g_: p_ + 0.5 * step_size * g_, p, g)
        q = jax.tree.map(lambda q_, p_: q_ + step_size * p_, q, p)
        g = grad_fn(q)
        p = jax.tree.map(lambda p_, g_: p_ + 0.5 * step_size * g_, p, g)
        return (q, p)

    return jax.lax.fori_loop(0, n_steps, body, (q, p))


def _kinetic(p):
    return 0.5 * sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(p))


def hmc_sample(
    log_prob_fn: Callable[[Any], jax.Array],
    init_position: Any,
    key: jax.Array,
    config: HMCConfig = HMCConfig(),
):
    """Run HMC; returns (samples, stats).

    samples: pytree like ``init_position`` with a leading
    ``n_samples`` axis (post-warmup draws only).
    stats: dict with acceptance probabilities, final step size.
    """
    grad_fn = jax.grad(log_prob_fn)
    cfg = config

    # dual-averaging state: (log_eps, log_eps_bar, h_bar)
    mu = jnp.log(10.0 * cfg.init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def step(carry, inp):
        q, logp, da_state, i = carry
        key = inp
        k_mom, k_acc = jax.random.split(key)
        leaves, treedef = jax.tree.flatten(q)
        flat_keys = jax.random.split(k_mom, len(leaves))
        p = jax.tree.unflatten(
            treedef,
            [
                jax.random.normal(k, l.shape, l.dtype)
                for k, l in zip(flat_keys, leaves)
            ],
        )
        log_eps, log_eps_bar, h_bar = da_state
        eps = jnp.exp(log_eps)
        q_new, p_new = _leapfrog(grad_fn, q, p, eps, cfg.n_leapfrog)
        logp_new = log_prob_fn(q_new)
        h_old = -logp + _kinetic(p)
        h_new = -logp_new + _kinetic(p_new)
        log_accept = jnp.minimum(0.0, -(h_new - h_old))
        accept_prob = jnp.exp(log_accept)
        accept_prob = jnp.where(jnp.isfinite(accept_prob), accept_prob, 0.0)
        # divergence: the Hamiltonian error blew up (Stan's criterion,
        # threshold 1000) or went non-finite — the trajectory left the
        # region the step size can integrate
        divergent = jnp.logical_or(
            ~jnp.isfinite(h_new), (h_new - h_old) > 1000.0
        )
        u = jax.random.uniform(k_acc)
        take = u < accept_prob
        q = jax.tree.map(
            lambda a, b: jnp.where(take, a, b), q_new, q
        )
        logp = jnp.where(take, logp_new, logp)

        # dual averaging (active only during warmup)
        in_warmup = i < cfg.n_warmup
        t = i.astype(jnp.float32) + 1.0
        h_bar_new = (
            (1.0 - 1.0 / (t + t0)) * h_bar
            + (cfg.target_accept - accept_prob) / (t + t0)
        )
        log_eps_new = mu - jnp.sqrt(t) / gamma * h_bar_new
        w = t ** (-kappa)
        log_eps_bar_new = w * log_eps_new + (1.0 - w) * log_eps_bar
        da_state = jax.lax.cond(
            in_warmup & cfg.adapt,
            lambda: (log_eps_new, log_eps_bar_new, h_bar_new),
            lambda: (log_eps_bar, log_eps_bar, h_bar),
        )
        return (q, logp, da_state, i + 1), (q, accept_prob, divergent)

    total = cfg.n_warmup + cfg.n_samples
    keys = jax.random.split(key, total)
    init_logp = log_prob_fn(init_position)
    da0 = (jnp.log(cfg.init_step_size), jnp.log(cfg.init_step_size), 0.0)
    (_, _, da_final, _), (qs, accepts, divs) = jax.lax.scan(
        step,
        (init_position, init_logp, da0, jnp.asarray(0, jnp.int32)),
        keys,
    )
    samples = jax.tree.map(lambda a: a[cfg.n_warmup :], qs)
    stats = {
        "accept_rate": jnp.mean(accepts[cfg.n_warmup :]),
        "warmup_accept_rate": jnp.mean(accepts[: cfg.n_warmup]),
        "step_size": jnp.exp(da_final[1]),
        "divergences": jnp.sum(divs[cfg.n_warmup :].astype(jnp.int32)),
    }
    return samples, stats


def hmc_sample_chains(
    log_prob_fn: Callable[[Any], jax.Array],
    init_position: Any,
    key: jax.Array,
    config: HMCConfig = HMCConfig(),
    n_chains: int = 4,
    jitter: float = 0.1,
    inits=None,
):
    """Run ``n_chains`` independent HMC chains via vmap over keys.

    Chain c starts at ``init_position + jitter * N(0, I)`` (over-dispersed
    starts are what make split-R-hat informative). Returns ``(samples,
    stats)`` with a leading ``(n_chains,)`` axis on every leaf — the
    shape :mod:`whvi_tpu.mcmc.diagnostics` consumes directly.
    """
    k_init, k_run = jax.random.split(key)
    if inits is not None:
        # explicit per-chain starts (pytree with leading n_chains axis),
        # e.g. draws from a trained q for mode-local validation of a
        # multimodal BNN posterior
        run_keys = jax.random.split(k_run, n_chains)
        return jax.vmap(
            lambda q0, k: hmc_sample(log_prob_fn, q0, k, config)
        )(inits, run_keys)
    leaves, treedef = jax.tree.flatten(init_position)
    init_keys = jax.random.split(k_init, n_chains * len(leaves)).reshape(
        n_chains, len(leaves), 2
    )

    def _jittered(c):
        return jax.tree.unflatten(
            treedef,
            [
                l + jitter * jax.random.normal(init_keys[c, i], l.shape, l.dtype)
                for i, l in enumerate(leaves)
            ],
        )

    inits = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_jittered(c) for c in range(n_chains)]
    )
    run_keys = jax.random.split(k_run, n_chains)
    return jax.vmap(
        lambda q0, k: hmc_sample(log_prob_fn, q0, k, config)
    )(inits, run_keys)


def make_whvi_g_log_posterior(net, params: dict, X, y):
    """Unnormalized log posterior over the per-layer ``g`` vectors.

    ``position`` is a dict {layer_index: g_array} for every WHVI layer;
    all other parameters stay frozen at ``params``. The likelihood term
    is the summed log-likelihood over (X, y); the prior is the same
    ``N(0, lambda_l I)`` the KL is computed against, so this is exactly
    the target of the variational approximation.
    """
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    y2 = y if y.ndim > 1 else y[:, None]
    bayes_idx = [
        i for i, l in enumerate(net.layers) if hasattr(l, "matrix")
    ]

    def log_posterior(position: dict) -> jax.Array:
        h = X
        for i, layer in enumerate(net.layers):
            p = params["layers"][i]
            if i in bayes_idx:
                h = layer.apply_given_g(p, h, position[i])
            else:
                h = layer.apply(p, h, jax.random.PRNGKey(0))
        # Gaussian likelihood, summed over the dataset
        lik = net.likelihood
        y_hat = h[None]  # (1, B, n_out) — mnll API wants a sample axis
        n = X.shape[0]
        loglik = -lik.mnll(params["likelihood"], y2, y_hat, n)
        prior = 0.0
        for i in bayes_idx:
            lam = net.layers[i].lambda_
            g = position[i]
            prior = prior + jnp.sum(
                -0.5 * jnp.square(g) / lam
                - 0.5 * jnp.log(2.0 * jnp.pi * lam)
            )
        return loglik + prior

    init = {
        i: params["layers"][i]["g_mu"].copy() for i in bayes_idx
    }
    return log_posterior, init


def moments(samples):
    """Per-leaf posterior mean and stddev of stacked samples."""
    mean = jax.tree.map(lambda a: jnp.mean(a, axis=0), samples)
    std = jax.tree.map(lambda a: jnp.std(a, axis=0), samples)
    return mean, std
