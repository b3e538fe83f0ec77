"""MCMC convergence diagnostics: split-R-hat, ESS, divergence counting.

Round-2 addition (VERDICT.md missing #3): without these the golden-sampler
validation of the VI posterior is unfalsifiable. Implements the standard
Vehtari-Gelman-Simpson-Carpenter-Buerkner (2021) estimators as used by
Stan/ArviZ, on plain ``jnp`` arrays so they run anywhere:

- :func:`split_rhat` — potential scale reduction over split chains;
- :func:`ess` — effective sample size via FFT autocovariance + Geyer's
  initial monotone positive sequence, combined across chains;
- :func:`summarize` — per-leaf moment/diagnostic table for a pytree of
  chains.

Array convention: ``chains`` has shape ``(n_chains, n_draws, *param)``.
No reference counterpart (the reference has no sampler at all).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["split_rhat", "ess", "summarize"]


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def _autocov(x: jnp.ndarray) -> jnp.ndarray:
    """Biased autocovariance along axis 1 via FFT. x: (C, N, ...)."""
    n = x.shape[1]
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    m = _next_pow2(2 * n)
    f = jnp.fft.rfft(xc, n=m, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=1)[:, :n].real
    return acov / n


def split_rhat(chains: jnp.ndarray) -> jnp.ndarray:
    """Split potential-scale-reduction R-hat.

    ``chains: (C, N, *param)`` -> R-hat per parameter element (shape
    ``param``). Each chain is split in half (2C half-chains); values
    near 1 indicate the half-chains agree in mean and variance.
    """
    chains = jnp.asarray(chains)
    C, N = chains.shape[:2]
    half = N // 2
    s = chains[:, : 2 * half].reshape((2 * C, half) + chains.shape[2:])
    m = jnp.mean(s, axis=1)  # (2C, *param)
    v = jnp.var(s, axis=1, ddof=1)
    W = jnp.mean(v, axis=0)
    B_over_n = jnp.var(m, axis=0, ddof=1)  # = B / half
    var_plus = (half - 1) / half * W + B_over_n
    return jnp.sqrt(var_plus / jnp.maximum(W, 1e-30))


def ess(chains: jnp.ndarray) -> jnp.ndarray:
    """Effective sample size combined across chains.

    ``chains: (C, N, *param)`` -> ESS per parameter element. Computes
    per-chain FFT autocovariances, the multi-chain correlation estimate
    ``rho_t = 1 - (W - mean_c acov_{c,t}) / var_plus``, and truncates
    with Geyer's initial monotone positive pair sequence (as Stan does).
    """
    chains = jnp.asarray(chains)
    C, N = chains.shape[:2]
    param_shape = chains.shape[2:]
    flat = chains.reshape(C, N, -1)  # (C, N, P)
    acov = _autocov(flat)  # (C, N, P)
    chain_var = acov[:, 0, :] * N / max(N - 1, 1)  # (C, P)
    W = jnp.mean(chain_var, axis=0)  # (P,)
    mean_acov = jnp.mean(acov, axis=0)  # (N, P)
    if C > 1:
        m = jnp.mean(flat, axis=1)  # (C, P)
        B_over_n = jnp.var(m, axis=0, ddof=1)
    else:
        B_over_n = jnp.zeros_like(W)
    var_plus = (N - 1) / N * W + B_over_n  # (P,)
    var_plus = jnp.maximum(var_plus, 1e-30)
    rho = 1.0 - (W[None, :] - mean_acov) / var_plus[None, :]  # (N, P)

    # Geyer pairs: P_k = rho_{2k} + rho_{2k+1}
    n_pairs = N // 2
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2, -1).sum(axis=1)  # (K, P)
    # keep pairs up to (exclusive) the first non-positive one; the k=0
    # pair (rho_0 = 1 plus rho_1) is always kept
    positive = pairs > 0.0
    keep = jnp.cumprod(positive.astype(jnp.float32), axis=0)
    keep = keep.at[0].set(1.0)
    # initial monotone sequence: enforce non-increasing pair sums
    mono = jax.lax.associative_scan(jnp.minimum, pairs, axis=0)
    mono = jnp.maximum(mono, 0.0)
    tau = -1.0 + 2.0 * jnp.sum(mono * keep, axis=0)  # (P,)
    n_eff = C * N / jnp.maximum(tau, 1e-3)
    # cap at the actual draw count (iid chains can over-estimate slightly)
    n_eff = jnp.minimum(n_eff, jnp.asarray(C * N, n_eff.dtype))
    return n_eff.reshape(param_shape) if param_shape else n_eff[0]


def summarize(samples, max_elems: int = 0) -> dict:
    """Per-leaf diagnostics for a pytree of chains ``(C, N, *param)``.

    Returns ``{leaf_path: {"mean", "sd", "rhat_max", "ess_min"}}`` with
    scalar floats — the shape of a Stan ``print(fit)`` table.
    """
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(samples)[0]
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        pooled = leaf.reshape((-1,) + leaf.shape[2:])
        out[name] = {
            "mean": float(jnp.mean(pooled)),
            "sd": float(jnp.std(pooled)),
            "rhat_max": float(jnp.max(split_rhat(leaf))),
            "ess_min": float(jnp.min(ess(leaf))),
        }
    return out
