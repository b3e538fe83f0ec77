"""UCI Bayesian-regression evaluation protocol.

Counterpart of reference ``evaluate_bayesian_regression_dnn``
(src/evaluation.py:30-108): standardize X, ``n_splits`` random 90/10
train/test splits, architecture ``n_in -> 128 -> 128 -> n_out`` with
ReLU, prior variance 3 on hidden layers and 1e-5 on the last, batch 64,
two-phase training (default 500 + 50000 epochs), 1 training MC sample,
64 eval samples, per-split checkpoint dirs, and mean/sd of test error
and MNLL over the splits.

Differences from the reference, all deliberate (SURVEY.md section 0):
the math is the paper-correct posterior; the optimizer schedule is
single-applied; phase 1 actually freezes the likelihood; ``s_init``
defaults to the variance-preserving scale with KL warmup (the
reference's exact settings are available via ``s_init=0.01,
kl_warmup_frac=0``).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable

import jax
import numpy as np

from whvi_tpu.models import WHVIRegression, mlp_layers
from whvi_tpu.train import TrainConfig, Trainer

__all__ = ["ProtocolConfig", "evaluate_bayesian_regression", "standardize"]


def standardize(X_train: np.ndarray, *rest: np.ndarray):
    """Fit mean/std on ``X_train``, apply to all (reference uses
    sklearn.StandardScaler on the full X, evaluation.py:64 — fitting on
    train only is the leakage-free variant; pass ``rest=()`` and call
    with the full X to reproduce the reference exactly)."""
    mu = X_train.mean(axis=0, keepdims=True)
    sd = X_train.std(axis=0, keepdims=True) + 1e-8
    out = [(X_train - mu) / sd]
    out.extend((r - mu) / sd for r in rest)
    return out if rest else out[0]


@dataclasses.dataclass(frozen=True)
class ProtocolConfig:
    n_splits: int = 8
    test_frac: float = 0.1
    hidden: tuple = (128, 128)
    lambda_hidden: float = 3.0
    lambda_last: float = 1e-5
    sigma0: float = 1.0
    batch_size: int = 64
    epochs1: int = 500
    epochs2: int = 50000
    train_samples: int = 1
    eval_samples: int = 64
    checkpoint_every: int = 5000
    s_init: float | str = "auto"
    kl_warmup_frac: float = 0.2  # fraction of total steps; 0 disables
    scale_reference_exact: bool = False  # standardize on full X like ref
    # Heteroscedastic Gaussian likelihood: the net emits [mean, raw_sd]
    # per target (BASELINE.json protein/kin8nm config). The head is a
    # split-prior Parallel pair: mean branch under lambda_last, noise
    # branch under lambda_noise (see the head construction below).
    heteroscedastic: bool = False
    lambda_noise: float = 1.0
    # Fraction of total train steps with the noise branch frozen at its
    # sigma0 init (mean-first curriculum; only applies to the split
    # heteroscedastic head — see TrainConfig.noise_freeze_steps).
    noise_freeze_frac: float = 0.5
    # Standardize targets for training and convert metrics back to the
    # original units (RMSE scales by sd_y; total MNLL gains
    # n * sum_d log sd_d). Default OFF: measured on yacht, training on
    # raw targets with sigma0=1 reaches lower RMSE than normalized
    # targets — the large initial residual/sigma ratio forces the mean
    # function to fit before the KL can collapse the posterior.
    normalize_y: bool = False
    # independent LRT noise per batch element (variance-reduced)
    per_example_noise: bool = False
    # non-square layer construction: "stack" (reference semantics) or
    # "pad" (one padded square block, full mixing — higher capacity for
    # very rectangular first/last layers; weights.PaddedSquareMatrix)
    rect_mode: str = "stack"
    # deterministic bias vectors on every WHVI layer (the reference
    # supports but never enables them; see mlp_layers docstring)
    bias: bool = False
    # drop the KL term entirely (MAP-with-noise ablation; reference
    # loss(..., ignore_kl) switch)
    ignore_kl: bool = False
    seed: int = 0


def evaluate_bayesian_regression(
    X: np.ndarray,
    y: np.ndarray,
    config: ProtocolConfig = ProtocolConfig(),
    ckpt_dir: str | None = None,
    log_fn: Callable[[dict], None] | None = None,
    mesh=None,
) -> dict:
    """Run the full protocol; returns mean/sd of RMSE and MNLL across
    splits plus per-split details (reference evaluation.py:66-108).

    ``mesh``: optional ``jax.sharding.Mesh`` with ``(data, sample)``
    axes — the whole protocol then trains through the SPMD sharded
    MC-ELBO (``train_samples`` must divide the sample axis;
    see Trainer)."""
    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.float32)
    y = y if y.ndim > 1 else y[:, None]
    n, n_in = X.shape
    n_out = y.shape[1]
    n_test = max(1, int(round(n * config.test_frac)))

    if config.scale_reference_exact:
        X = standardize(X)

    # The model, config and Trainer are identical for every split —
    # build them ONCE so all splits share one set of compiled programs.
    # (Until round 3 these lived inside the split loop: a fresh Trainer
    # per split meant a fresh jit cache, i.e. a full train-step
    # recompile per split — ~8x the compile cost over this
    # environment's slow remote-compile tunnel.)
    layers = mlp_layers(
        n_in,
        n_out,
        hidden=config.hidden,
        lambda_hidden=config.lambda_hidden,
        lambda_last=config.lambda_last,
        activation=None,
        rect_mode=config.rect_mode,
        bias=config.bias,
    )
    if config.heteroscedastic:
        # Split-prior head: the [mean, raw_sigma] columns get separate
        # WHVI branches — mean keeps the protocol's lambda_last (1e-5),
        # the noise column gets lambda_noise. A single shared head loses
        # either way: 1e-5 pins sigma(x) to a constant, 1.0
        # un-regularizes the mean (real-data A/B, RESULTS round 3).
        from whvi_tpu.models import Parallel, WHVILinear

        h_last = config.hidden[-1] if config.hidden else n_in
        layers = layers[:-1] + [
            Parallel(
                (
                    layers[-1],  # mean branch: the protocol head as built
                    WHVILinear(
                        h_last,
                        n_out,
                        lambda_=config.lambda_noise,
                        rect_mode=config.rect_mode,
                        bias=config.bias,
                    ),
                )
            )
        ]
    net = WHVIRegression(
        layers,
        sigma0=config.sigma0,
        train_samples=config.train_samples,
        eval_samples=config.eval_samples,
    )
    if config.heteroscedastic:
        from whvi_tpu.models import HeteroscedasticGaussianLikelihood

        net = dataclasses.replace(
            net,
            likelihood=HeteroscedasticGaussianLikelihood(
                sigma0=config.sigma0
            ),
        )
    # apply s_init / noise options to every WHVI layer (recursing into
    # Parallel split-head branches)
    def _with_opts(l):
        if hasattr(l, "s_init"):
            return dataclasses.replace(
                l,
                s_init=config.s_init,
                per_example_noise=config.per_example_noise,
            )
        if hasattr(l, "branches"):
            return dataclasses.replace(
                l, branches=tuple(_with_opts(b) for b in l.branches)
            )
        return l

    net = dataclasses.replace(
        net, layers=tuple(_with_opts(l) for l in net.layers)
    )
    total = config.epochs1 + config.epochs2
    # mirror the epoch runner's batch rounding: with a mesh, B is rounded
    # up to the data-shard multiple, which can REDUCE the batch count —
    # otherwise kl_warmup/noise-freeze fractions would cover more of
    # training than configured (advisor round 3)
    n_tr = n - n_test
    B = min(config.batch_size, n_tr)
    if mesh is not None:
        d = mesh.shape["data"]
        B = -(-B // d) * d
    steps_per_epoch = -(-n_tr // B)
    tcfg = TrainConfig(
        batch_size=config.batch_size,
        epochs1=config.epochs1,
        epochs2=config.epochs2,
        checkpoint_every=config.checkpoint_every,
        ignore_kl=config.ignore_kl,
        kl_warmup_steps=int(
            total * steps_per_epoch * config.kl_warmup_frac
        ),
        noise_freeze_steps=int(
            total * steps_per_epoch * config.noise_freeze_frac
        )
        if config.heteroscedastic
        else 0,
    )
    trainer = Trainer(net, tcfg, mesh=mesh)
    # one jitted predict shared by the heteroscedastic/normalize-y
    # metric fallbacks below (was a fresh jit(lambda) per split)
    import jax.numpy as jnp

    predict_fn = jax.jit(
        lambda p, x, k: net.predict(p, x, k, config.eval_samples)
    )

    rng = np.random.RandomState(config.seed)
    results = []
    for split in range(config.n_splits):
        perm = rng.permutation(n)
        test_idx, train_idx = perm[:n_test], perm[n_test:]
        X_tr, X_te = X[train_idx], X[test_idx]
        y_tr, y_te = y[train_idx], y[test_idx]
        if not config.scale_reference_exact:
            X_tr, X_te = standardize(X_tr, X_te)

        state = trainer.init(jax.random.PRNGKey(config.seed * 1000 + split))
        split_dir = (
            os.path.join(ckpt_dir, f"split-{split}") if ckpt_dir else None
        )
        if config.normalize_y:
            mu_y = y_tr.mean(axis=0, keepdims=True)
            sd_y = y_tr.std(axis=0, keepdims=True) + 1e-8
            y_tr_fit = (y_tr - mu_y) / sd_y
            y_te_fit = (y_te - mu_y) / sd_y
        else:
            y_tr_fit, y_te_fit = y_tr, y_te
        t0 = time.time()
        state, logs = trainer.fit(
            state, X_tr, y_tr_fit, ckpt_dir=split_dir, log_fn=log_fn
        )
        wall = time.time() - t0
        metrics = trainer.evaluate(
            state.params, X_te, y_te_fit, jax.random.PRNGKey(split)
        )
        if config.heteroscedastic and "rmse" not in metrics:
            y_hat = predict_fn(
                state.params, jnp.asarray(X_te), jax.random.PRNGKey(split)
            )
            mean, _ = net.likelihood.split(y_hat)
            pred = np.asarray(jnp.mean(mean, axis=0))
            metrics["rmse"] = float(
                np.sqrt(np.mean((pred - np.asarray(y_te_fit)) ** 2))
            )
        if config.normalize_y:
            # convert normalized-unit metrics back to original units
            key = jax.random.PRNGKey(split)
            y_hat = predict_fn(state.params, jnp.asarray(X_te), key)
            if config.heteroscedastic:
                y_hat, _ = net.likelihood.split(y_hat)
            y_hat_orig = np.asarray(y_hat) * sd_y[None] + mu_y[None]
            rmse = float(
                np.sqrt(np.mean((y_hat_orig.mean(axis=0) - y_te) ** 2))
            )
            n_te = len(y_te)
            log_sd_total = float(np.sum(np.log(sd_y)))
            metrics = {
                "rmse": rmse,
                "mnll": metrics["mnll"] + n_te * log_sd_total,
                "mnll_per_point": metrics["mnll_per_point"] + log_sd_total,
                # coverage is affine-invariant: normalized-unit value IS
                # the original-unit value
                **(
                    {"coverage95": metrics["coverage95"]}
                    if "coverage95" in metrics
                    else {}
                ),
                # density change of variables: -log p_orig = -log p_norm
                # + sum_d log sd_d, identically for the predictive metric
                **(
                    {
                        "pred_mnll_per_point": metrics["pred_mnll_per_point"]
                        + log_sd_total
                    }
                    if "pred_mnll_per_point" in metrics
                    else {}
                ),
            }
        entry = {
            "split": split,
            "rmse": metrics["rmse"],
            "mnll": metrics["mnll"],
            "mnll_per_point": metrics["mnll_per_point"],
            "wall_s": wall,
            "epochs_per_s": total / max(wall, 1e-9),
        }
        if "pred_mnll_per_point" in metrics:
            entry["pred_mnll_per_point"] = metrics["pred_mnll_per_point"]
        if "coverage95" in metrics:
            entry["coverage95"] = float(metrics["coverage95"])
        results.append(entry)
        if log_fn:
            log_fn(entry)

    rmses = np.array([r["rmse"] for r in results])
    mnlls = np.array([r["mnll"] for r in results])
    mnllpp = np.array([r["mnll_per_point"] for r in results])
    out = {
        "rmse_mean": float(rmses.mean()),
        "rmse_sd": float(rmses.std()),
        "mnll_mean": float(mnlls.mean()),
        "mnll_sd": float(mnlls.std()),
        "mnll_per_point_mean": float(mnllpp.mean()),
        "mnll_per_point_sd": float(mnllpp.std()),
        "splits": results,
    }
    if all("pred_mnll_per_point" in r for r in results):
        pp = np.array([r["pred_mnll_per_point"] for r in results])
        out["pred_mnll_per_point_mean"] = float(pp.mean())
        out["pred_mnll_per_point_sd"] = float(pp.std())
    if all("coverage95" in r for r in results):
        cov = np.array([r["coverage95"] for r in results])
        out["coverage95_mean"] = float(cov.mean())
        out["coverage95_sd"] = float(cov.std())
    return out
