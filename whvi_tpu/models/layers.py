"""Layer API: shape-dispatched WHVI linear layers + deterministic layers.

Counterpart of reference ``src/layers.py`` (WHVI base + WHVILinear) with
the same dispatch semantics (layers.py:31-38):

  n_in == 1            -> ColumnMatrix(n_out)
  n_out == 1           -> ColumnMatrix(n_in, transposed=True)
  square power of two  -> SquarePow2Matrix(n_in)
  otherwise            -> StackedMatrix(n_in, n_out)

Layers are stateless description objects with ``init(key) -> params``,
``apply(params, x, key) -> y`` and ``kl(params) -> scalar``. Deterministic
layers (activations, Dense) take and ignore a key and have ``kl = 0`` —
the analogue of the reference's duck-typed ``kl`` attribute scan
(src/networks.py:32-34), made explicit.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from whvi_tpu.models.weights import (
    ColumnMatrix,
    PaddedSquareMatrix,
    SquarePow2Matrix,
    StackedMatrix,
)
from whvi_tpu.ops.hadamard import is_pow_of_2

__all__ = [
    "WHVILinear",
    "Dense",
    "Activation",
    "Parallel",
    "relu",
    "cosine",
    "sigmoid",
    "tanh",
]


@dataclasses.dataclass(frozen=True)
class WHVILinear:
    """Bayesian linear layer with a WHVI-structured variational posterior.

    ``WHVILinear(n_in, n_out, lambda_, bias)`` — reference
    src/layers.py:19-48. ``lambda_`` is the prior variance of ``g``
    (default 1e-5 like the reference; the UCI protocol uses 3 for hidden
    layers, evaluation.py:79-85). ``lrt`` selects the local
    reparameterization trick where supported (square/stacked paths).
    """

    n_in: int
    n_out: int
    lambda_: float = 1e-5
    bias: bool = False
    lrt: bool = True
    # S1/S2 init stddev: 0.01 reproduces the reference (weights.py:29-30);
    # "auto" = D**-0.5 variance-preserving (see weights.SquarePow2Matrix).
    s_init: float | str = 0.01
    # independent LRT noise per batch element (variance-reduced; the
    # reference shares one eps across the batch, weights.py:92)
    per_example_noise: bool = False
    # non-square construction: "stack" = vertical stack of square blocks
    # (reference semantics, weights.py:111-208); "pad" = one padded
    # square block with full mixing (higher capacity for very
    # rectangular shapes, see weights.PaddedSquareMatrix)
    rect_mode: str = "stack"
    # opt-in per-example LRT for column-shaped layers (n_in==1 or
    # n_out==1): variance-reduced estimator vs the reference-faithful
    # explicit column sample (weights.ColumnMatrix.apply; requires
    # per_example_noise to engage)
    column_lrt: bool = False

    def __post_init__(self):
        if self.rect_mode not in ("stack", "pad"):
            raise ValueError(
                f"rect_mode must be 'stack' or 'pad', got {self.rect_mode!r}"
            )

    @property
    def matrix(self):
        if self.n_in == 1:
            return ColumnMatrix(
                self.n_out,
                self.lambda_,
                s_init=self.s_init,
                use_lrt=self.column_lrt,
            )
        if self.n_out == 1:
            return ColumnMatrix(
                self.n_in,
                self.lambda_,
                transposed=True,
                s_init=self.s_init,
                use_lrt=self.column_lrt,
            )
        if self.n_in == self.n_out and is_pow_of_2(self.n_in):
            return SquarePow2Matrix(self.n_in, self.lambda_, self.s_init)
        if self.rect_mode == "pad":
            return PaddedSquareMatrix(
                self.n_in, self.n_out, self.lambda_, self.s_init
            )
        return StackedMatrix(self.n_in, self.n_out, self.lambda_, self.s_init)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        params = self.matrix.init(key, dtype)
        if self.bias:
            params = dict(params, bias=jnp.zeros((self.n_out,), dtype))
        return params

    def kl(self, params: dict, lambda_=None) -> jax.Array:
        """``lambda_``: optional (traceable) prior-variance override —
        the config-stacked protocol sweeps lambda per replica without
        rebuilding the (static) layer description."""
        return self.matrix.kl(params, lambda_)

    def apply(self, params: dict, x: jax.Array, key: jax.Array) -> jax.Array:
        y = self.matrix.apply(
            params,
            x,
            key,
            lrt=self.lrt,
            per_example_noise=self.per_example_noise,
        )
        if self.bias:
            y = y + params["bias"]
        return y

    def sample_W(self, params: dict, key: jax.Array) -> jax.Array:
        """Dense ``(n_out, n_in)`` weight sample (oracle / inspection)."""
        return self.matrix.sample_W(params, key)

    def apply_given_g(
        self, params: dict, x: jax.Array, g: jax.Array
    ) -> jax.Array:
        """Deterministic forward with explicit ``g`` (MCMC path)."""
        y = self.matrix.apply_given_g(params, x, g)
        if self.bias:
            y = y + params["bias"]
        return y


@dataclasses.dataclass(frozen=True)
class Dense:
    """Deterministic dense layer (interop; the reference mixes
    ``nn.Linear`` with WHVI layers in test/networks.py:11-23)."""

    n_in: int
    n_out: int
    bias: bool = True

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        k1, _ = jax.random.split(key)
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.n_in, dtype))
        params = {
            "w": jax.random.uniform(
                k1, (self.n_in, self.n_out), dtype, minval=-scale, maxval=scale
            )
        }
        if self.bias:
            params["b"] = jnp.zeros((self.n_out,), dtype)
        return params

    def kl(self, params: dict, lambda_=None) -> jax.Array:
        del lambda_
        return jnp.zeros((), params["w"].dtype)

    def apply(self, params: dict, x: jax.Array, key: jax.Array) -> jax.Array:
        del key
        y = x @ params["w"]
        if self.bias:
            y = y + params["b"]
        return y


@dataclasses.dataclass(frozen=True)
class Parallel:
    """Independent branches over the same input, outputs concatenated on
    the last axis.

    Built for split-prior output heads: a heteroscedastic ``[mean,
    raw_sigma]`` head can give the mean column the protocol's tight
    ``lambda=1e-5`` prior and the noise column a non-degenerate one.
    With a single shared head either choice loses — ``1e-5`` pins the
    noise curve to a constant, ``1.0`` un-regularizes the mean
    (real-data A/B in docs/RESULTS.md round 3). Each branch draws its
    own posterior noise (independent key folds).
    """

    branches: tuple

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        keys = jax.random.split(key, len(self.branches))
        return {
            "branches": tuple(
                b.init(k, dtype) for b, k in zip(self.branches, keys)
            )
        }

    def kl(self, params: dict, lambda_=None) -> jax.Array:
        """``lambda_``: None, or a tuple of per-branch overrides (each
        None or a traceable scalar) — e.g. ``(None, lambda_noise)``
        sweeps the split-head noise prior per stacked replica."""
        if lambda_ is None:
            lambda_ = (None,) * len(self.branches)
        if len(lambda_) != len(self.branches):
            raise ValueError(
                f"lambda_ must have one entry per branch "
                f"({len(self.branches)}), got {len(lambda_)}"
            )
        return sum(
            b.kl(p, l)
            for b, p, l in zip(
                self.branches, params["branches"], lambda_
            )
        )

    def apply(self, params: dict, x: jax.Array, key: jax.Array) -> jax.Array:
        keys = jax.random.split(key, len(self.branches))
        return jnp.concatenate(
            [
                b.apply(p, x, k)
                for b, p, k in zip(self.branches, params["branches"], keys)
            ],
            axis=-1,
        )


@dataclasses.dataclass(frozen=True)
class Activation:
    """Stateless elementwise activation as a layer."""

    fn: Callable[[jax.Array], jax.Array]
    name: str = "activation"

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        del key, dtype
        return {}

    def kl(self, params: dict, lambda_=None) -> jax.Array:
        del params, lambda_
        return jnp.zeros(())

    def apply(self, params: dict, x: jax.Array, key: jax.Array) -> jax.Array:
        del params, key
        return self.fn(x)


relu = Activation(jax.nn.relu, "relu")
# The paper's toy example uses a cosine activation
# (reference src/activations.py:5-13).
cosine = Activation(jnp.cos, "cosine")
sigmoid = Activation(jax.nn.sigmoid, "sigmoid")
tanh = Activation(jnp.tanh, "tanh")
