"""No-U-Turn Sampler (static-unrolled, multinomial variant).

NUTS (Hoffman & Gelman 2014) with the modern multinomial state
selection (as in Stan), restructured for XLA: the doubling tree of each
draw is *statically unrolled* to ``max_tree_depth`` — every draw costs
exactly ``2^max_tree_depth - 1`` leapfrog steps and U-turn/divergence
termination is applied by masking rather than early exit. This trades
the dynamic-trajectory compute savings for a fixed compute graph with
no data-dependent control flow — the standard accelerator-friendly
formulation (SURVEY.md section 7 "no data-dependent Python control flow
inside jit").

Semantics per draw:
- repeatedly double the trajectory in a random direction;
- a doubling whose subtree contains an internal U-turn or divergence is
  discarded (its proposal cannot be selected), and expansion stops;
- otherwise the new half's proposal replaces the current one with
  probability ``w_new / (w_old + w_new)`` (multinomial), and expansion
  stops when the full trajectory U-turns.

Step size is dual-averaged during warmup exactly as in mcmc.hmc, and a
diagonal mass matrix is adapted in expanding warmup windows (Stan phase
II; shared machinery in mcmc.adapt) — momenta are drawn from the
estimated metric and the U-turn criterion uses metric-weighted momenta.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["NUTSConfig", "nuts_sample", "nuts_sample_chains"]


@dataclasses.dataclass(frozen=True)
class NUTSConfig:
    n_samples: int = 1000
    n_warmup: int = 500
    max_tree_depth: int = 6
    init_step_size: float = 1e-2
    target_accept: float = 0.8
    adapt: bool = True
    # Windowed diagonal mass-matrix adaptation (Stan phase II; see
    # mcmc.adapt) — on by default, same rationale as HMCConfig.
    mass_adapt: bool = True
    # Dense (full-covariance) metric instead of diagonal: captures
    # cross-coordinate posterior geometry; O(dim^2) memory and an
    # O(dim^3) Cholesky per draw, so meant for LOW-dimensional
    # posteriors (the 16-dim mixed-lambda WHVI g-posterior is the
    # motivating case — round-4 measured limitation of the diagonal
    # metric on over-converged mode-local posteriors).
    dense_mass: bool = False


def _flat(tree):
    leaves, treedef = jax.tree.flatten(tree)
    sizes = [l.size for l in leaves]
    shapes = [l.shape for l in leaves]
    vec = jnp.concatenate([jnp.ravel(l) for l in leaves])
    def unflat(v):
        out, off = [], 0
        for s, sh in zip(sizes, shapes):
            out.append(v[off : off + s].reshape(sh))
            off += s
        return jax.tree.unflatten(treedef, out)
    return vec, unflat


def nuts_sample(
    log_prob_fn: Callable[[Any], jax.Array],
    init_position: Any,
    key: jax.Array,
    config: NUTSConfig = NUTSConfig(),
):
    """Run NUTS; returns (samples, stats) like ``hmc_sample``."""
    cfg = config
    q0_vec, unflat = _flat(init_position)
    dim = q0_vec.size

    def logp_vec(qv):
        return log_prob_fn(unflat(qv))

    grad_vec = jax.grad(logp_vec)

    dense = cfg.dense_mass

    def mdot(m_inv, p):
        # metric-weighted momentum: diagonal elementwise or dense matvec
        return m_inv @ p if dense else m_inv * p

    def leapfrog(q, p, eps, m_inv):
        p = p + 0.5 * eps * grad_vec(q)
        q = q + eps * mdot(m_inv, p)
        p = p + 0.5 * eps * grad_vec(q)
        return q, p

    def uturn(q_minus, q_plus, p_minus, p_plus, m_inv):
        # rate of change of q is m_inv @ p, so the U-turn projection
        # uses the metric-weighted momenta (Stan's criterion)
        dq = q_plus - q_minus
        return (jnp.dot(dq, mdot(m_inv, p_minus)) < 0.0) | (
            jnp.dot(dq, mdot(m_inv, p_plus)) < 0.0
        )

    def kin(p, m_inv):
        return 0.5 * jnp.dot(p, mdot(m_inv, p))

    def sample_momentum(k, m_inv):
        xi = jax.random.normal(k, (dim,))
        if not dense:
            return xi * jax.lax.rsqrt(m_inv)
        # p ~ N(0, M) with M = m_inv^{-1}: m_inv = L L^T (Cholesky)
        # => p = L^{-T} xi has cov L^{-T} L^{-1} = m_inv^{-1}
        L = jnp.linalg.cholesky(m_inv)
        return jax.scipy.linalg.solve_triangular(L.T, xi, lower=False)

    NEG_INF = jnp.asarray(-jnp.inf)

    def build_tree(depth, q, p, direction, eps, h0, key, m_inv):
        """Statically-unrolled subtree of 2^depth leapfrog steps.

        Returns (q_minus, p_minus, q_plus, p_plus, q_prop, log_w,
        turned, diverged). ``q/p`` is the trajectory edge to grow from
        (already in ``direction``'s frame: we integrate with signed eps,
        so minus/plus here are 'start edge'/'far edge')."""
        if depth == 0:
            q1, p1 = leapfrog(q, p, direction * eps, m_inv)
            h1 = -logp_vec(q1) + kin(p1, m_inv)
            log_w = h0 - h1  # multinomial weight relative to start energy
            diverged = ~jnp.isfinite(log_w) | (log_w < -1000.0)
            log_w = jnp.where(diverged, NEG_INF, log_w)
            return q1, p1, q1, p1, q1, log_w, diverged, diverged
        k1, k2, k3 = jax.random.split(key, 3)
        (qm, pm, qp, pp, prop_l, lw_l, turn_l, div_l) = build_tree(
            depth - 1, q, p, direction, eps, h0, k1, m_inv
        )
        # grow from the far edge of the left subtree
        (qm2, pm2, qp2, pp2, prop_r, lw_r, turn_r, div_r) = build_tree(
            depth - 1, qp, pp, direction, eps, h0, k2, m_inv
        )
        total = jnp.logaddexp(lw_l, lw_r)
        take_right = (
            jnp.log(jax.random.uniform(k3)) < lw_r - total
        ) & ~turn_r
        prop = jnp.where(take_right, prop_r, prop_l)
        # U-turn across the combined subtree (orient by direction sign)
        turned_here = uturn(
            jnp.where(direction > 0, qm, qp2),
            jnp.where(direction > 0, qp2, qm),
            jnp.where(direction > 0, pm, pp2),
            jnp.where(direction > 0, pp2, pm),
            m_inv,
        )
        turned = turn_l | turn_r | turned_here
        log_w = jnp.where(turn_r, lw_l, total)
        return qm, pm, qp2, pp2, prop, log_w, turned, div_l | div_r

    gamma, t0, kappa = 0.05, 10.0, 0.75
    from whvi_tpu.mcmc import adapt as _adapt
    from whvi_tpu.mcmc.adapt import warmup_schedule

    if dense:
        welford_init = _adapt.welford_cov_init
        welford_update = _adapt.welford_cov_update
        window_update = _adapt.window_update_dense
    else:
        welford_init = _adapt.welford_init
        welford_update = _adapt.welford_update
        window_update = _adapt.window_update

    acc_mask, end_mask = (
        warmup_schedule(cfg.n_warmup)
        if (cfg.adapt and cfg.mass_adapt)
        else (jnp.zeros(cfg.n_warmup, bool), jnp.zeros(cfg.n_warmup, bool))
    )
    pad_mask = jnp.zeros(cfg.n_samples, bool)
    acc_mask = jnp.concatenate([jnp.asarray(acc_mask), pad_mask])
    end_mask = jnp.concatenate([jnp.asarray(end_mask), pad_mask])

    def draw(carry, inp):
        q, mu, log_eps, log_eps_bar, h_bar, da_t, m_inv, wf, i = carry
        key, w_acc, w_end = inp
        k_mom, k_dirs, k_tree, k_acc = jax.random.split(key, 4)
        p0 = sample_momentum(k_mom, m_inv)
        h0 = -logp_vec(q) + kin(p0, m_inv)
        eps = jnp.exp(log_eps)

        # trajectory state
        q_minus, p_minus = q, p0
        q_plus, p_plus = q, p0
        prop = q
        log_w = jnp.zeros(())  # weight of the initial point
        stopped = jnp.zeros((), bool)
        any_div = jnp.zeros((), bool)
        sum_alpha = jnp.zeros(())
        n_alpha = jnp.zeros(())

        dirs = jax.random.bernoulli(k_dirs, 0.5, (cfg.max_tree_depth,))
        tree_keys = jax.random.split(k_tree, cfg.max_tree_depth)
        acc_keys = jax.random.split(k_acc, cfg.max_tree_depth)
        for j in range(cfg.max_tree_depth):
            direction = jnp.where(dirs[j], 1.0, -1.0)
            edge_q = jnp.where(direction > 0, q_plus, q_minus)
            edge_p = jnp.where(direction > 0, p_plus, p_minus)
            (qm, pm, qp, pp, prop_j, lw_j, turn_j, div_j) = build_tree(
                j, edge_q, edge_p, direction, eps, h0, tree_keys[j], m_inv
            )
            any_div = any_div | (div_j & ~stopped)
            # mean acceptance statistic for dual averaging (per doubling)
            alpha_j = jnp.minimum(1.0, jnp.exp(lw_j - jnp.log(2.0**j)))
            sum_alpha = sum_alpha + jnp.where(stopped, 0.0, alpha_j)
            n_alpha = n_alpha + jnp.where(stopped, 0.0, 1.0)
            usable = ~stopped & ~turn_j
            # multinomial merge of the new half
            take = (
                jnp.log(jax.random.uniform(acc_keys[j]))
                < lw_j - jnp.logaddexp(log_w, lw_j)
            ) & usable
            prop = jnp.where(take, prop_j, prop)
            log_w = jnp.where(usable, jnp.logaddexp(log_w, lw_j), log_w)
            # update edges only if the doubling was kept
            q_minus = jnp.where(usable & (direction < 0), qp, q_minus)
            p_minus = jnp.where(usable & (direction < 0), pp, p_minus)
            q_plus = jnp.where(usable & (direction > 0), qp, q_plus)
            p_plus = jnp.where(usable & (direction > 0), pp, p_plus)
            full_turn = uturn(q_minus, q_plus, p_minus, p_plus, m_inv)
            stopped = stopped | turn_j | full_turn

        accept_stat = jnp.where(n_alpha > 0, sum_alpha / n_alpha, 0.0)

        # dual averaging (t counts draws since the last window restart)
        in_warmup = i < cfg.n_warmup
        t = da_t.astype(jnp.float32) + 1.0
        h_bar_new = (1.0 - 1.0 / (t + t0)) * h_bar + (
            cfg.target_accept - accept_stat
        ) / (t + t0)
        log_eps_new = mu - jnp.sqrt(t) / gamma * h_bar_new
        w = t ** (-kappa)
        log_eps_bar_new = w * log_eps_new + (1.0 - w) * log_eps_bar
        da_on = in_warmup & cfg.adapt
        log_eps = jnp.where(da_on, log_eps_new, log_eps_bar)
        log_eps_bar = jnp.where(da_on, log_eps_bar_new, log_eps_bar)
        h_bar = jnp.where(da_on, h_bar_new, h_bar)
        da_t = da_t + 1

        # mass-matrix window (Stan phase II; see mcmc.adapt): accumulate
        # the selected draw, update the metric + restart dual averaging
        # at window ends
        wf = welford_update(wf, prop, w_acc)
        wf, m_inv = window_update(wf, m_inv, w_end)
        mu = jnp.where(w_end, jnp.log(10.0) + log_eps, mu)
        log_eps_bar = jnp.where(w_end, log_eps, log_eps_bar)
        h_bar = jnp.where(w_end, 0.0, h_bar)
        da_t = jnp.where(w_end, 0, da_t)
        return (
            (prop, mu, log_eps, log_eps_bar, h_bar, da_t, m_inv, wf, i + 1),
            (prop, accept_stat, any_div),
        )

    total = cfg.n_warmup + cfg.n_samples
    keys = jax.random.split(key, total)
    carry0 = (
        q0_vec,
        jnp.log(10.0 * cfg.init_step_size),
        jnp.log(cfg.init_step_size),
        jnp.log(cfg.init_step_size),
        jnp.zeros(()),
        jnp.asarray(0, jnp.int32),
        jnp.eye(dim) if dense else jnp.ones((dim,)),
        welford_init(dim),
        jnp.asarray(0, jnp.int32),
    )
    carry, (qs, alphas, divs) = jax.lax.scan(
        draw, carry0, (keys, acc_mask, end_mask)
    )
    qs = qs[cfg.n_warmup :]
    samples = jax.vmap(unflat)(qs)
    stats = {
        "accept_stat": jnp.mean(alphas[cfg.n_warmup :]),
        "step_size": jnp.exp(carry[3]),
        "divergences": jnp.sum(divs[cfg.n_warmup :].astype(jnp.int32)),
        "inv_mass": carry[6],
    }
    return samples, stats


def nuts_sample_chains(
    log_prob_fn: Callable[[Any], jax.Array],
    init_position: Any,
    key: jax.Array,
    config: NUTSConfig = NUTSConfig(),
    n_chains: int = 4,
    jitter: float = 0.1,
    inits=None,
    mesh=None,
):
    """``n_chains`` independent NUTS chains (over-dispersed jittered
    starts); every output leaf gains a leading ``(n_chains,)`` axis,
    ready for :mod:`whvi_tpu.mcmc.diagnostics`. ``mesh``: optional
    ``jax.sharding.Mesh`` — shard the chain axis over all mesh axes
    (same chain set as the vmapped path, partitioned; see
    :mod:`whvi_tpu.mcmc.chains`)."""
    from whvi_tpu.mcmc.chains import run_chains

    return run_chains(
        nuts_sample,
        log_prob_fn,
        init_position,
        key,
        config,
        n_chains,
        jitter,
        inits,
        mesh,
    )
