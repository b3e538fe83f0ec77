"""The core WHVI structured-matrix operator.

A WHVI weight matrix is the structured reparameterization (reference
report/introduction.tex:9-14, src/weights.py:66-85):

    W_bar(u) = S1 . H . diag(u) . H . S2          (S1, S2 diagonal)

Rather than materializing ``W_bar`` (the reference does, via two row-wise
matrix FWHTs — which provably collapses its W to a diagonal matrix, see
SURVEY.md section 0 bug 1), we apply it directly to activations:

    y = x @ W_bar(u)^T
      = s1 * fwht(u * fwht(s2 * x))        [per row of x; H = H^T]

because ``W_bar(u)^T = S2 H diag(u) H S1`` and a row-vector product with a
symmetric matrix is the last-axis vector transform. This is ``O(D log D)``
(butterfly) / MXU-matmul (Kronecker) work, never touches a ``D x D``
intermediate, and is the unit the fused Pallas kernel implements.

Broadcasting: ``s1, u, s2`` may carry leading axes that broadcast against
``x``'s leading axes. The stacked non-square matrix (reference
src/weights.py:111-208) becomes parameters of shape ``(stack, D)`` applied
to ``x[..., None, :]`` — no Python loop over blocks.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from whvi_tpu.ops.hadamard import build_H, fwht

__all__ = [
    "whvi_mul",
    "whvi_dense",
    "whvi_mul_dense_oracle",
    "set_whvi_mul_backend",
]

# "xla" (default): Kronecker-factor MXU matmuls, XLA-fused — fastest on
# the measured v5e (the Pallas pipeline is DMA-bound there, see
# docs/RESULTS.md round 2). "pallas": route eligible square products
# through the fused Pallas kernel (opt-in; correct under vmap/grad, but
# note vmapped pallas_call compiles very slowly over remote backends).
# The choice is read at TRACE time: set it before building jitted fns.
_BACKEND = os.environ.get("WHVI_MUL_BACKEND", "xla")


def set_whvi_mul_backend(name: str) -> None:
    """Select the whvi_mul compute path: "xla" or "pallas"."""
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"backend must be 'xla' or 'pallas', got {name!r}")
    _BACKEND = name


def whvi_mul(
    s1: jax.Array, u: jax.Array, s2: jax.Array, x: jax.Array
) -> jax.Array:
    """Compute ``x @ W_bar(u)^T`` with ``W_bar(u) = S1 H diag(u) H S2``.

    Args:
      s1, u, s2: diagonals, shape ``(D,)`` or any shape broadcastable
        against ``x``'s leading axes (e.g. ``(stack, D)``).
      x: activations ``(..., D)``.

    Returns:
      ``(..., D)`` (after broadcasting leading axes), same semantics as the
      reference's ``w_bar``-based products (src/weights.py:66-93) but with
      the paper-correct two-sided transform.

    With the "pallas" backend selected (``set_whvi_mul_backend`` /
    ``WHVI_MUL_BACKEND``), eligible calls — plain ``(D,)`` diagonals
    (the square-matrix path), supported D — run through the fused
    Pallas kernel; everything else falls back to the XLA path.
    """
    if _BACKEND == "pallas" and jnp.ndim(s1) == 1 and jnp.ndim(u) == 1:
        from whvi_tpu.ops.fwht_pallas import pallas_supported, whvi_mul_pallas

        D = x.shape[-1]
        if jnp.ndim(s2) == 1 and x.ndim >= 1 and pallas_supported(D):
            interpret = jax.default_backend() != "tpu"
            batch = x.shape[:-1]
            y = whvi_mul_pallas(
                s1, u, s2, x.reshape(-1, D), interpret
            )
            return y.reshape(batch + (D,))
    return s1 * fwht(u * fwht(s2 * x))


def whvi_dense(
    s1: jax.Array, u: jax.Array, s2: jax.Array, precision: str | None = None
) -> jax.Array:
    """Materialize ``W_bar(u) = diag(s1) H diag(u) H diag(s2)`` densely.

    Test oracle + the column-matrix path (reference src/weights.py:244-248
    needs the materialized matrix to reshape it into a column). ``s1, u,
    s2`` may carry leading batch axes. ``precision`` is the MXU operand
    mode of the single H @ (.) matmul (None = the module default of
    ops.hadamard; oracles should pass "highest").
    """
    from whvi_tpu.ops.hadamard import _DEFAULT_PRECISION, _dot_precision

    if precision is None:
        precision = _DEFAULT_PRECISION
    D = s1.shape[-1]
    acc = jnp.float32 if s1.dtype.itemsize <= 4 else s1.dtype
    H = build_H(D, acc)
    inner = u[..., :, None] * H * s2[..., None, :]  # diag(u) H diag(s2)
    return s1[..., :, None] * jnp.matmul(
        H,
        inner,
        preferred_element_type=acc,
        precision=_dot_precision(precision),
    ).astype(s1.dtype)


def whvi_mul_dense_oracle(
    s1: jax.Array, u: jax.Array, s2: jax.Array, x: jax.Array
) -> jax.Array:
    """Oracle: ``x @ W_bar(u)^T`` via the dense matrix. Tests only."""
    W = whvi_dense(s1, u, s2)
    return jnp.einsum("...ij,...j->...i", W, x)
