"""Likelihoods for MC-ELBO estimation.

Counterpart of reference ``src/likelihoods.py`` with two deliberate
upgrades called out in SURVEY.md:

- the Gaussian noise scale is ``softplus``-constrained (the reference keeps
  a raw ``nn.Parameter`` sigma with no positivity constraint,
  likelihoods.py:16, which ``Normal`` would reject if optimization drove it
  <= 0);
- heteroscedastic Gaussian and categorical (softmax) likelihoods are
  provided (BASELINE.json configs), which the reference lacks.

Shape convention: predictions carry the MC-sample axis **first**,
``y_hat: (S, B, n_out)`` — the natural layout under ``vmap`` over sample
keys. (The reference stacks samples last, ``(B, n_out, S)``,
networks.py:50-51.)

``mnll(params, y, y_hat, n)`` is the reference's *total-dataset* MNLL
estimate (likelihoods.py:18-29): ``-n * mean_{S,B} sum_out log p(y | y_hat)``
where ``n`` is the dataset size. Per-point MNLL (the unit the original
paper reports) is ``mnll / n``.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

__all__ = [
    "GaussianLikelihood",
    "HeteroscedasticGaussianLikelihood",
    "CategoricalLikelihood",
]

_LOG_2PI = math.log(2.0 * math.pi)


def _weighted_total(lp_per_point: jax.Array, n, weights) -> jax.Array:
    """Total-dataset MNLL estimate from per-(S, B) log densities.

    ``-(n / (S * B_eff)) * sum(w * lp)`` with ``B_eff = sum(w)``; with
    ``weights=None`` this is the reference's ``-(n / (S * B)) * sum lp``
    (likelihoods.py:18-29). Row weights de-bias statically-padded
    batches: padding rows get weight 0, so a wrap-padded batch of k real
    rows yields exactly the estimator of the k-row batch (see
    train/trainer.py wrap-padding).
    """
    S = lp_per_point.shape[0]
    if weights is None:
        B_eff = lp_per_point.shape[1]
        total = jnp.sum(lp_per_point)
    else:
        w = weights.reshape(-1)
        B_eff = jnp.sum(w)
        total = jnp.sum(lp_per_point * w[None, :])
    return -(n / (S * B_eff)) * total


def _inv_softplus(y: float) -> float:
    return math.log(math.expm1(y))


def _gauss_logpdf(y, mean, sigma):
    z = (y - mean) / sigma
    return -0.5 * (z * z + _LOG_2PI) - jnp.log(sigma)


@dataclasses.dataclass(frozen=True)
class GaussianLikelihood:
    """Homoscedastic Gaussian likelihood with learnable noise stddev.

    ``sigma = softplus(rho)``, initialized so that sigma == ``sigma0``
    (reference GaussianLikelihood(sigma), likelihoods.py:13-16).
    """

    sigma0: float = 1.0

    def init(self, dtype=jnp.float32) -> dict:
        return {"rho": jnp.asarray(_inv_softplus(self.sigma0), dtype)}

    def sigma(self, params: dict) -> jax.Array:
        return jax.nn.softplus(params["rho"])

    def mnll(
        self,
        params: dict,
        y: jax.Array,
        y_hat: jax.Array,
        n: jax.Array | int,
        weights: jax.Array | None = None,
    ) -> jax.Array:
        """Total-dataset MNLL estimate from an MC batch.

        y: (B, n_out) targets; y_hat: (S, B, n_out) MC predictions;
        n: dataset size. Matches reference mnll_batch_estimate
        (likelihoods.py:18-29): ``-n/(B*S) * sum log N(y | y_hat, sigma)``.
        Optional ``weights (B,)`` de-bias padded batches (0 = padding row).
        """
        sigma = self.sigma(params)
        lp = _gauss_logpdf(y[None], y_hat, sigma)  # (S, B, n_out)
        return _weighted_total(jnp.sum(lp, axis=-1), n, weights)

    def log_prob(
        self, params: dict, y: jax.Array, y_hat: jax.Array
    ) -> jax.Array:
        """Per-sample, per-point joint log density ``(S, B)`` (outputs
        summed). Input to the posterior-predictive MNLL
        ``-mean_B logmeanexp_S`` — the metric the original paper's UCI
        tables report (standard Hernandez-Lobato & Adams protocol), as
        opposed to the reference's mean-of-log estimator (its
        likelihoods.py:18-29), which is only a bound on it."""
        sigma = self.sigma(params)
        return jnp.sum(_gauss_logpdf(y[None], y_hat, sigma), axis=-1)

    def predict(self, params: dict, y_hat: jax.Array):
        """Predictive mean and stddev from MC samples ``(S, B, n_out)``.

        Mixture-of-Gaussians moments: mean of means; variance = MC variance
        of means + noise variance.
        """
        mean = jnp.mean(y_hat, axis=0)
        var = jnp.var(y_hat, axis=0) + jnp.square(self.sigma(params))
        return mean, jnp.sqrt(var)


@dataclasses.dataclass(frozen=True)
class HeteroscedasticGaussianLikelihood:
    """Gaussian likelihood with input-dependent noise.

    The network emits ``2 * n_out`` features per point: ``[mean,
    raw_sigma]`` split on the last axis, ``sigma = softplus(raw_sigma +
    shift) + sigma_min`` with ``shift = inv_softplus(sigma0 -
    sigma_min)``. Since
    the WHVI head output is near 0 at init (0.01-scale weight means),
    the shift makes ``sigma0`` the *initial* noise scale — the same
    lever the homoscedastic likelihood exposes, which the tuned UCI
    recipes set to 0.1-0.3 on normalized targets. New capability over
    the reference (BASELINE.json UCI protein/kin8nm config).

    Note the shift was introduced in round 3: earlier rounds used
    ``sigma = softplus(raw) + sigma_min`` directly, i.e. the old
    raw-head mapping is reproduced by ``sigma0 = softplus(0) ~= 0.693``.
    """

    sigma_min: float = 1e-4
    sigma0: float = 1.0

    def init(self, dtype=jnp.float32) -> dict:
        del dtype
        return {}

    def split(self, y_hat: jax.Array):
        mean, raw = jnp.split(y_hat, 2, axis=-1)
        shift = _inv_softplus(max(self.sigma0 - self.sigma_min, 1e-6))
        return mean, jax.nn.softplus(raw + shift) + self.sigma_min

    def mnll(
        self,
        params: dict,
        y: jax.Array,
        y_hat: jax.Array,
        n: jax.Array | int,
        weights: jax.Array | None = None,
    ) -> jax.Array:
        del params
        mean, sigma = self.split(y_hat)
        lp = _gauss_logpdf(y[None], mean, sigma)
        return _weighted_total(jnp.sum(lp, axis=-1), n, weights)

    def log_prob(
        self, params: dict, y: jax.Array, y_hat: jax.Array
    ) -> jax.Array:
        """Per-sample, per-point joint log density ``(S, B)``."""
        del params
        mean, sigma = self.split(y_hat)
        return jnp.sum(_gauss_logpdf(y[None], mean, sigma), axis=-1)

    def predict(self, params: dict, y_hat: jax.Array):
        del params
        mean, sigma = self.split(y_hat)
        pred_mean = jnp.mean(mean, axis=0)
        var = jnp.var(mean, axis=0) + jnp.mean(jnp.square(sigma), axis=0)
        return pred_mean, jnp.sqrt(var)


@dataclasses.dataclass(frozen=True)
class CategoricalLikelihood:
    """Softmax likelihood over logits (Bayesian classification; MNIST
    config in BASELINE.json). ``y`` holds integer class labels ``(B,)``."""

    def init(self, dtype=jnp.float32) -> dict:
        del dtype
        return {}

    def mnll(
        self,
        params: dict,
        y: jax.Array,
        y_hat: jax.Array,
        n: jax.Array | int,
        weights: jax.Array | None = None,
    ) -> jax.Array:
        del params
        y = y.reshape(-1).astype(jnp.int32)  # accept (B,) or (B, 1)
        logp = jax.nn.log_softmax(y_hat, axis=-1)  # (S, B, C)
        ll = jnp.take_along_axis(logp, y[None, :, None], axis=-1)
        return _weighted_total(ll[..., 0], n, weights)

    def log_prob(
        self, params: dict, y: jax.Array, y_hat: jax.Array
    ) -> jax.Array:
        """Per-sample, per-point class log probability ``(S, B)``."""
        del params
        y = y.reshape(-1).astype(jnp.int32)
        logp = jax.nn.log_softmax(y_hat, axis=-1)
        return jnp.take_along_axis(logp, y[None, :, None], axis=-1)[..., 0]

    def predict(self, params: dict, y_hat: jax.Array):
        """Posterior-mean class probabilities ``(B, C)``."""
        del params
        return jnp.mean(jax.nn.softmax(y_hat, axis=-1), axis=0)
