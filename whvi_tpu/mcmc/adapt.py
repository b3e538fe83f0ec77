"""Warmup adaptation shared by the golden samplers: expanding-window
diagonal mass-matrix estimation (Stan phase II) + Welford accumulators.

The round-2 samplers adapted only the step size (dual averaging) with an
identity mass matrix — a known failure mode for posteriors mixing very
different scales (the flagship WHVI posterior mixes prior scales
lambda = 3 on hidden layers with 1e-5 on the last layer, a ~550x stddev
ratio; round-2 VERDICT weak #3). The standard fix, implemented here, is
Stan's windowed scheme (Stan reference manual, "HMC algorithm
parameters"; Hoffman & Gelman 2014 for the dual averaging it wraps):

- warmup splits into an initial fast buffer (step size only), a series
  of doubling "slow" windows (25, 50, 100, ... draws), and a terminal
  fast buffer;
- within each slow window, per-coordinate posterior variance is
  accumulated with Welford's algorithm over the post-accept positions;
- at each window end the inverse mass is set to the regularized
  variance estimate ``(n/(n+5)) var + 1e-3 (5/(n+5))`` (shrinkage
  toward unit scale, Stan's constants), the accumulator resets, and
  dual averaging restarts anchored at the current step size (the new
  metric changes the optimal step size).

Everything is shaped for ``lax.scan``: the schedule is precomputed on
the host as boolean masks (one per step), so the compiled graph has no
data-dependent control flow.

No reference counterpart (the reference has no sampler at all); this is
the capability-extension tier of SURVEY.md section 7 item 7.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_variance",
    "welford_cov_init",
    "welford_cov_update",
    "welford_covariance",
    "warmup_schedule",
    "window_update",
    "window_update_dense",
]


class WelfordState(NamedTuple):
    count: jax.Array  # scalar float
    mean: jax.Array   # (dim,)
    m2: jax.Array     # (dim,)


def welford_init(dim: int, dtype=jnp.float32) -> WelfordState:
    return WelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
    )


def welford_update(state: WelfordState, x: jax.Array, on) -> WelfordState:
    """One masked Welford step: accumulate ``x`` iff ``on`` (traced bool)."""
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    new = WelfordState(count, mean, m2)
    return jax.tree.map(
        lambda a, b: jnp.where(on, a, b), new, state
    )


def welford_variance(state: WelfordState) -> jax.Array:
    """Stan-regularized sample variance: shrink toward 1e-3 * I with
    weight 5/(n+5) (keeps the metric sane for short windows)."""
    n = state.count
    var = state.m2 / jnp.maximum(n - 1.0, 1.0)
    w = n / (n + 5.0)
    return w * var + 1e-3 * (1.0 - w)


def welford_cov_init(dim: int, dtype=jnp.float32) -> WelfordState:
    """Full-covariance accumulator: ``m2`` is ``(dim, dim)``.

    For low-dimensional posteriors (the mixed-lambda WHVI g-posterior
    is 16-dim) a DENSE metric captures the cross-coordinate geometry a
    diagonal cannot — the round-4 measured limitation on over-converged
    mode-local posteriors (docs/RESULTS.md round 4) is exactly where
    the diagonal estimate collapses.
    """
    return WelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim, dim), dtype),
    )


def welford_cov_update(state: WelfordState, x: jax.Array, on) -> WelfordState:
    """Masked Welford covariance step (outer-product form)."""
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + jnp.outer(delta, x - mean)
    new = WelfordState(count, mean, m2)
    return jax.tree.map(lambda a, b: jnp.where(on, a, b), new, state)


def welford_covariance(state: WelfordState) -> jax.Array:
    """Stan-regularized sample covariance: shrink toward 1e-3 * I,
    plus a scale-aware ridge (1e-3 of the mean diagonal).

    The extra ridge is an f32 necessity Stan (in doubles) skips: a
    window whose draws lie on a tight correlation ridge yields a
    near-rank-1 covariance; its Cholesky then has a tiny diagonal, the
    momentum draw ``L^{-T} xi`` explodes, and the f32 kinetic energy
    overflows — measured blow-up on a rho=0.95 Gaussian before this
    floor (tests/test_mass_adapt.py dense tests).
    """
    n = state.count
    cov = state.m2 / jnp.maximum(n - 1.0, 1.0)
    w = n / (n + 5.0)
    dim = state.mean.shape[0]
    eye = jnp.eye(dim, dtype=cov.dtype)
    scale = jnp.maximum(jnp.trace(cov) / dim, 1e-3)
    return w * cov + (1e-3 * (1.0 - w) + 1e-3 * w * scale) * eye


def warmup_schedule(
    n_warmup: int,
    init_buffer: int = 75,
    term_buffer: int = 50,
    base_window: int = 25,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side window masks for ``n_warmup`` adaptation steps.

    Returns ``(accumulate, window_end)`` boolean arrays of length
    ``n_warmup``: ``accumulate[t]`` marks steps whose position feeds the
    variance estimate (the slow windows), ``window_end[t]`` marks the
    last step of each slow window (where the mass matrix updates and
    dual averaging restarts). Buffers follow Stan: if the requested
    buffers don't fit, they shrink to the 15% / 75% / 10% proportions;
    if no slow window fits at all, both masks are all-False (pure
    step-size adaptation — the round-2 behavior).
    """
    accumulate = np.zeros(n_warmup, dtype=bool)
    window_end = np.zeros(n_warmup, dtype=bool)
    if n_warmup < 20:
        # a variance estimate from a handful of draws is noise even with
        # shrinkage; fall back to pure step-size adaptation
        return accumulate, window_end
    if n_warmup < init_buffer + term_buffer + base_window:
        init_buffer = int(0.15 * n_warmup)
        term_buffer = int(0.10 * n_warmup)
        base_window = n_warmup - init_buffer - term_buffer
        if base_window <= 0:
            return accumulate, window_end
    slow_end = n_warmup - term_buffer
    t = init_buffer
    w = base_window
    while t < slow_end:
        # the last window absorbs the remainder (Stan: a final short
        # window would be a noisy metric, so extend instead of split)
        end = t + w
        if end + 2 * w > slow_end:
            end = slow_end
        accumulate[t:end] = True
        window_end[end - 1] = True
        t = end
        w *= 2
    return accumulate, window_end


def window_update(wf: WelfordState, m_inv: jax.Array, at_end):
    """At a window end: inverse mass <- regularized variance, reset the
    accumulator. Masked (traced ``at_end``), scan-friendly."""
    new_m_inv = jnp.where(at_end, welford_variance(wf), m_inv)
    fresh = welford_init(m_inv.shape[0], m_inv.dtype)
    new_wf = jax.tree.map(
        lambda f, o: jnp.where(at_end, f, o), fresh, wf
    )
    return new_wf, new_m_inv


def window_update_dense(wf: WelfordState, m_inv: jax.Array, at_end):
    """Dense-metric window end: inverse mass (a ``(dim, dim)``
    posterior-covariance estimate) <- regularized sample covariance."""
    new_m_inv = jnp.where(at_end, welford_covariance(wf), m_inv)
    fresh = welford_cov_init(m_inv.shape[0], m_inv.dtype)
    new_wf = jax.tree.map(
        lambda f, o: jnp.where(at_end, f, o), fresh, wf
    )
    return new_wf, new_m_inv
