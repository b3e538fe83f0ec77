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

__all__ = [
    "ProtocolConfig",
    "evaluate_bayesian_regression",
    "evaluate_config_grid",
    "standardize",
]


# Measured-safe per-dispatch work for the remote (axon) backend: a
# single device execution running ~2-3+ minutes crashes the TPU worker
# (round-5 measurement: replicas x train-rows x chunk-epochs of
# 16 x 8192 x 2500 reproducibly dies; 8 x 7373 x 2500 and
# 16 x 8192 x 500 run clean). Both protocol entry points cap their
# scan chunk against this budget.
_SAFE_DISPATCH_WORK = 8 * 7373 * 2500


def _dispatch_chunk_bound(work_per_epoch: int) -> int:
    """Largest scan-chunk length keeping one dispatch inside the
    measured-safe budget. The floor is 10, NOT a round 100: a flat
    100-epoch floor could itself authorize ~2x the budget at very
    large replica-row counts — exactly the regime that kills the
    worker (round-5 review). If even 10-epoch chunks exceed the
    budget, warn: the run may hit the backend's dispatch wall.
    """
    bound = _SAFE_DISPATCH_WORK // max(work_per_epoch, 1)
    if bound < 10:
        import warnings

        warnings.warn(
            f"replica-rows per epoch ({work_per_epoch}) are so large "
            "that even 10-epoch dispatch chunks exceed the measured-"
            "safe budget; the remote backend may kill long dispatches",
            stacklevel=3,
        )
    return max(10, bound)


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
    # scan-chunk size (epochs per device dispatch). The protocol default
    # is larger than TrainConfig's 250: on remote backends every chunk
    # boundary costs a dispatch + metric fetch (~1.5 s under load —
    # round-4 measurement tripled the full-protocol wall at 250)
    epochs_per_call: int = 2500
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
    # opt-in per-example LRT on column-shaped layers (n_out==1 heads):
    # variance-reduced vs the reference-faithful explicit column sample
    # (needs per_example_noise; see weights.ColumnMatrix.apply)
    column_lrt: bool = False
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
    # Train all n_splits as ONE vmapped two-phase fit instead of a
    # sequential per-split Python loop ("auto" = on whenever no mesh is
    # passed). The splits are shape-identical, so stacking (params,
    # opt_state, key, data) along a leading axis turns the protocol's
    # 8 serialized D=128 fits (0.5% measured MFU, round-3 VERDICT
    # missing #1) into batched matmuls; per-split results match the
    # sequential loop bit-for-bit (same keys; tests/test_evaluation.py).
    vmap_splits: bool | str = "auto"
    # Post-hoc predictive-variance temperature (whvi_tpu.calibration):
    # hold calib_frac of each train split out of training, fit the
    # closed-form ML temperature tau on it, and report tempered
    # coverage (coverage95_cal) + tau next to the raw coverage95.
    # Round 3 measured miscalibration both ways with no knob to act on
    # it (VERDICT missing #4); this is the knob.
    calibrate: bool = False
    calib_frac: float = 0.1
    # "quantile" (default): coverage-matched tau (q95(|z_cal|)/1.96 —
    # targets the reported coverage metric directly); "nll": closed-form
    # Gaussian-ML tau (better density calibration, but lands badly on
    # coverage when the predictive is non-Gaussian / calib set is tiny;
    # measured on yacht: 0.984 raw -> 0.871 with ML tau)
    calib_mode: str = "quantile"
    # Fit ONE temperature on all splits' pooled calibration z-scores
    # instead of a per-split tau. z-scores are scale-free, so pooling
    # is exact and gives the quantile fit 8x the data for one shared
    # scalar — the per-split tau on yacht-sized sets is a single order
    # statistic of ~30-50 points (coverage95_cal sd 0.085, round-4
    # RESULTS; VERDICT round-4 weak #6).
    calib_pooled: bool = False
    seed: int = 0


def _build_net(config: ProtocolConfig, n_in: int, n_out: int):
    """Protocol network from a config (shared by the single-config
    protocol and the config-stacked grid — one construction path)."""
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
            kw = dict(
                s_init=config.s_init,
                per_example_noise=config.per_example_noise,
            )
            if hasattr(l, "column_lrt"):
                kw["column_lrt"] = config.column_lrt
            return dataclasses.replace(l, **kw)
        if hasattr(l, "branches"):
            return dataclasses.replace(
                l, branches=tuple(_with_opts(b) for b in l.branches)
            )
        return l

    return dataclasses.replace(
        net, layers=tuple(_with_opts(l) for l in net.layers)
    )


def evaluate_bayesian_regression(
    X: np.ndarray,
    y: np.ndarray,
    config: ProtocolConfig = ProtocolConfig(),
    ckpt_dir: str | None = None,
    log_fn: Callable[[dict], None] | None = None,
    mesh=None,
    split_mesh=None,
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
    net = _build_net(config, n_in, n_out)
    total = config.epochs1 + config.epochs2
    # mirror the epoch runner's batch rounding: with a mesh, B is rounded
    # up to the data-shard multiple, which can REDUCE the batch count —
    # otherwise kl_warmup/noise-freeze fractions would cover more of
    # training than configured (advisor round 3)
    n_tr = n - n_test
    if config.calibrate:
        # the calibration holdout comes out of the TRAIN rows, so the
        # Trainer sees fewer steps/epoch — compute the warmup/freeze
        # fractions on the size it actually trains on (round-4 review)
        n_tr -= max(1, int(round(n_tr * config.calib_frac)))
    B = min(config.batch_size, n_tr)
    if mesh is not None:
        d = mesh.shape["data"]
        B = -(-B // d) * d
    steps_per_epoch = -(-n_tr // B)
    use_vmap = (
        config.vmap_splits
        if isinstance(config.vmap_splits, bool)
        else mesh is None
    )
    # Dispatch-duration guard (shared budget _SAFE_DISPATCH_WORK): only
    # ever SHRINKS the configured chunk — an explicit smaller
    # epochs_per_call must stay smaller (round-5 review: a max() floor
    # on the user's value could re-create the long dispatch the guard
    # exists to prevent).
    epc = config.epochs_per_call
    if use_vmap:
        epc = min(
            epc, _dispatch_chunk_bound(config.n_splits * n_tr)
        )
    tcfg = TrainConfig(
        batch_size=config.batch_size,
        epochs1=config.epochs1,
        epochs2=config.epochs2,
        epochs_per_call=epc,
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
    if config.calibrate:
        # hasattr(likelihood, "predict") is NOT the contract: the
        # categorical predict returns a single probs array, which would
        # fail later with an opaque tuple-unpack at moments_fn instead
        # of a clean error here (round-4 advisor finding). Calibration
        # needs the Gaussian two-moment ``predict -> (mean, sd)``.
        from whvi_tpu.models import (
            GaussianLikelihood,
            HeteroscedasticGaussianLikelihood,
        )

        if not isinstance(
            net.likelihood,
            (GaussianLikelihood, HeteroscedasticGaussianLikelihood),
        ):
            raise ValueError(
                "calibrate=True needs a Gaussian-family likelihood "
                "whose .predict returns two-moment (mean, sd); got "
                f"{type(net.likelihood).__name__} (classification "
                "temperature lives in calibration.fit_logit_temperature)"
            )

    if ckpt_dir:
        # Isolate checkpoints per protocol configuration: resume is on
        # by default and parameter SHAPES stay compatible across many
        # config changes (e.g. --calibrate shrinks the train set but
        # not the model), so a stale checkpoint from a different config
        # would silently skip training — and a calibrate run would then
        # fit its temperature on rows the restored model trained on
        # (round-4 review finding #2).
        import hashlib

        cfg_hash = hashlib.sha256(
            repr(sorted(dataclasses.asdict(config).items())).encode()
        ).hexdigest()[:10]
        ckpt_dir = os.path.join(ckpt_dir, f"cfg-{cfg_hash}")

    if split_mesh is not None and not use_vmap:
        # loud like Trainer: a silently-dropped split_mesh would run
        # the protocol sequentially on one device (round-4 review #6)
        raise ValueError(
            "split_mesh requires the vmapped-splits protocol (don't "
            "combine it with mesh= or vmap_splits=False)"
        )
    trainer = Trainer(
        net,
        tcfg,
        mesh=mesh,
        vmap_splits=use_vmap,
        # single-axis ("split",) mesh: shard the vmapped replica axis
        # across devices (pure jit annotations, zero collectives);
        # n_splits must be a multiple of its device count
        split_mesh=split_mesh,
    )
    # one jitted predict shared by the heteroscedastic/normalize-y
    # metric fallbacks below (was a fresh jit(lambda) per split)
    import jax.numpy as jnp

    predict_fn = jax.jit(
        lambda p, x, k: net.predict(p, x, k, config.eval_samples)
    )
    moments_fn = (
        jax.jit(lambda lp, yh: net.likelihood.predict(lp, yh))
        if hasattr(net.likelihood, "predict")
        else None
    )

    # Per-split data prep (identical draw order whether the fits run
    # sequentially or vmapped: all permutations come from one rng).
    rng = np.random.RandomState(config.seed)
    splits = []
    for split in range(config.n_splits):
        perm = rng.permutation(n)
        test_idx, train_idx = perm[:n_test], perm[n_test:]
        if config.calibrate:
            # hold a calibration fraction out of the TRAIN rows (the
            # temperature must be fitted on data the model never saw;
            # train_idx is already a random permutation slice)
            n_cal = max(1, int(round(len(train_idx) * config.calib_frac)))
            cal_idx, train_idx = train_idx[:n_cal], train_idx[n_cal:]
        else:
            cal_idx = np.zeros((0,), np.int64)
        X_tr, X_te = X[train_idx], X[test_idx]
        X_cal = X[cal_idx]
        y_tr, y_te = y[train_idx], y[test_idx]
        y_cal = y[cal_idx]
        if not config.scale_reference_exact:
            X_tr, X_te, X_cal = standardize(X_tr, X_te, X_cal)
        if config.normalize_y:
            mu_y = y_tr.mean(axis=0, keepdims=True)
            sd_y = y_tr.std(axis=0, keepdims=True) + 1e-8
            y_tr_fit = (y_tr - mu_y) / sd_y
            y_te_fit = (y_te - mu_y) / sd_y
            y_cal_fit = (y_cal - mu_y) / sd_y
        else:
            mu_y = sd_y = None
            y_tr_fit, y_te_fit, y_cal_fit = y_tr, y_te, y_cal
        splits.append(
            dict(
                X_tr=X_tr,
                X_te=X_te,
                X_cal=X_cal,
                y_tr_fit=y_tr_fit,
                y_te=y_te,
                y_te_fit=y_te_fit,
                y_cal_fit=y_cal_fit,
                mu_y=mu_y,
                sd_y=sd_y,
            )
        )

    if use_vmap:
        return _run_vmapped_protocol(
            net, trainer, config, splits, total, ckpt_dir, log_fn
        )

    results = []
    cal_inputs: list = []
    cal_rows: list = []
    for split in range(config.n_splits):
        d = splits[split]
        X_tr, X_te = d["X_tr"], d["X_te"]
        y_te = d["y_te"]
        y_tr_fit, y_te_fit = d["y_tr_fit"], d["y_te_fit"]
        mu_y, sd_y = d["mu_y"], d["sd_y"]

        state = trainer.init(jax.random.PRNGKey(config.seed * 1000 + split))
        split_dir = (
            os.path.join(ckpt_dir, f"split-{split}") if ckpt_dir else None
        )
        t0 = time.time()
        state, logs = trainer.fit(
            state, X_tr, y_tr_fit, ckpt_dir=split_dir, log_fn=log_fn
        )
        wall = time.time() - t0
        metrics = trainer.evaluate(
            state.params, X_te, y_te_fit, jax.random.PRNGKey(split)
        )
        # ONE test-set forward pass shared by the hetero-rmse fallback,
        # normalize-y conversion and calibration (same fix as the
        # vmapped path — each is a remote program dispatch)
        y_hat_te = None
        if config.calibrate or config.normalize_y or (
            config.heteroscedastic and "rmse" not in metrics
        ):
            y_hat_te = predict_fn(
                state.params, jnp.asarray(X_te), jax.random.PRNGKey(split)
            )
        if config.heteroscedastic and "rmse" not in metrics:
            mean, _ = net.likelihood.split(y_hat_te)
            pred = np.asarray(jnp.mean(mean, axis=0))
            metrics["rmse"] = float(
                np.sqrt(np.mean((pred - np.asarray(y_te_fit)) ** 2))
            )
        if config.normalize_y:
            # convert normalized-unit metrics back to original units
            y_hat = y_hat_te
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
        if config.calibrate:
            y_hat_cal = predict_fn(
                state.params,
                jnp.asarray(d["X_cal"]),
                jax.random.PRNGKey(100000 + split),
            )
            m_c, s_c = moments_fn(state.params["likelihood"], y_hat_cal)
            m_t, s_t = moments_fn(state.params["likelihood"], y_hat_te)
            cal_inputs.append(
                (d["y_cal_fit"], m_c, s_c, y_te_fit, m_t, s_t)
            )
            if not config.calib_pooled:
                # per-split tau needs no cross-split data: compute it
                # NOW so streamed log entries keep their temperature
                # fields (round-5 review — only pooling defers)
                cal_rows.append(
                    _calibrate_splits(cal_inputs[-1:], config)[0]
                )
                tau, cov_cal, _ = cal_rows[-1]
                entry["temperature"] = tau
                entry["coverage95_cal"] = cov_cal
        results.append(entry)
        if log_fn:
            # with calib_pooled the temperature fields are attached
            # AFTER the split loop (pooling needs every split's calib
            # z-scores), so they are absent from streamed entries; the
            # returned `splits` have them.
            log_fn(entry)

    cal = None
    if config.calibrate:
        if config.calib_pooled:
            cal = _calibrate_splits(cal_inputs, config)
            for entry, (tau, cov_cal, _) in zip(results, cal):
                entry["temperature"] = tau
                entry["coverage95_cal"] = cov_cal
        else:
            cal = cal_rows  # already computed (and logged) in-loop
    out = _aggregate(results)
    if cal is not None:
        _attach_reliability(
            out,
            [z for _, _, z in cal],
            [z / tau for tau, _, z in cal],
        )
        out["calib_pooled"] = bool(config.calib_pooled)
    return out


def _calibrate_splits(cal_inputs: list, config) -> list:
    """Fit temperatures and score test sets for every split.

    ``cal_inputs``: per-split ``(y_cal, m_c, s_c, y_te, m_t, s_t)``
    moment tuples. Returns ``[(tau, tempered coverage95, raw test
    z-scores), ...]``. With ``config.calib_pooled`` ONE tau is fitted
    on the concatenated calib z-scores of all splits (z is scale-free,
    so cross-split pooling is exact — 8x the data for one shared
    scalar; cuts the single-order-statistic variance of the quantile
    tau on small datasets, round-4 VERDICT weak #6)."""
    from scipy.stats import norm

    from whvi_tpu import calibration

    z_cals = [
        calibration._z(
            np.asarray(y_c), np.asarray(m_c), np.asarray(s_c)
        ).reshape(-1)
        for y_c, m_c, s_c, _, _, _ in cal_inputs
    ]
    z_tes = [
        calibration._z(
            np.asarray(y_t), np.asarray(m_t), np.asarray(s_t)
        ).reshape(-1)
        for _, _, _, y_t, m_t, s_t in cal_inputs
    ]
    if config.calib_pooled:
        tau = calibration.fit_temperature_from_z(
            np.concatenate(z_cals), mode=config.calib_mode
        )
        taus = [tau] * len(cal_inputs)
    else:
        taus = [
            calibration.fit_temperature_from_z(z, mode=config.calib_mode)
            for z in z_cals
        ]
    zcrit = norm.ppf(0.975)
    return [
        (tau, float(np.mean(np.abs(z) <= zcrit * tau)), z)
        for tau, z in zip(taus, z_tes)
    ]


def _attach_reliability(out: dict, raw_z_pool, cal_z_pool) -> None:
    """Pooled 10-bin reliability tables (test z-scores across splits),
    raw and tempered, plus temperature/coverage aggregates."""
    from whvi_tpu import calibration

    results = out["splits"]
    taus = np.array([r["temperature"] for r in results])
    cov = np.array([r["coverage95_cal"] for r in results])
    out["temperature_mean"] = float(taus.mean())
    out["temperature_sd"] = float(taus.std())
    out["coverage95_cal_mean"] = float(cov.mean())
    out["coverage95_cal_sd"] = float(cov.std())
    out["reliability_raw"] = calibration.table_from_z(
        np.concatenate(raw_z_pool)
    )
    out["reliability_cal"] = calibration.table_from_z(
        np.concatenate(cal_z_pool)
    )


def _aggregate(results: list) -> dict:
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


def _run_vmapped_protocol(
    net, trainer, config: ProtocolConfig, splits, total, ckpt_dir, log_fn
) -> dict:
    """All ``n_splits`` 90/10 fits as ONE vmapped two-phase training run.

    The reference trains its 8 splits in a sequential Python loop
    (src/evaluation.py:66-101) and so did rounds 1-3 here — at 0.5%
    measured MFU, because one D=128/batch-64 model cannot feed the MXU.
    Every split is shape-identical, so the whole protocol stacks along
    a leading replica axis: params, Adam state, PRNG keys and data all
    vmap cleanly through the Trainer's scanned epoch runner, and every
    matmul gains a factor-K batch dimension. Per-split results are
    bit-identical to the sequential loop (same per-split keys; asserted
    in tests/test_evaluation.py). Checkpoints hold the whole stack
    under ``ckpt_dir/stacked`` (resume-compatible).
    """
    import jax.numpy as jnp

    K = config.n_splits
    Xs_tr = np.stack([d["X_tr"] for d in splits])
    ys_tr = np.stack([d["y_tr_fit"] for d in splits])
    Xs_te = np.stack([d["X_te"] for d in splits])
    ys_te_fit = np.stack([d["y_te_fit"] for d in splits])

    init_keys = jnp.stack(
        [jax.random.PRNGKey(config.seed * 1000 + s) for s in range(K)]
    )
    eval_keys = jnp.stack([jax.random.PRNGKey(s) for s in range(K)])
    state = trainer.init(init_keys)
    stack_dir = os.path.join(ckpt_dir, "stacked") if ckpt_dir else None
    t0 = time.time()
    state, logs = trainer.fit(
        state, Xs_tr, ys_tr, ckpt_dir=stack_dir, log_fn=log_fn
    )
    wall = time.time() - t0
    metrics = trainer.evaluate(state.params, Xs_te, ys_te_fit, eval_keys)

    vmapped_predict = jax.jit(
        jax.vmap(lambda p, x, k: net.predict(p, x, k, config.eval_samples))
    )
    # ONE test-set forward pass shared by the hetero-rmse fallback, the
    # normalize-y conversions AND calibration below: each is a full
    # (K, S, B) program dispatch over the remote tunnel (round-4 review
    # finding #5 — this used to run up to three times)
    y_hat_te_full = None
    if config.calibrate or config.normalize_y or (
        config.heteroscedastic and "rmse" not in metrics
    ):
        y_hat_te_full = vmapped_predict(
            state.params, jnp.asarray(Xs_te), eval_keys
        )  # (K, S, B, out-or-2*out)
    if config.heteroscedastic and "rmse" not in metrics:
        mean, _ = net.likelihood.split(y_hat_te_full)
        pred = np.asarray(jnp.mean(mean, axis=1))  # (K, B, n_out)
        metrics["rmse"] = np.sqrt(
            np.mean((pred - ys_te_fit) ** 2, axis=(1, 2))
        )
    if config.normalize_y:
        # same change-of-variables conversions as the sequential path,
        # done per split in numpy (K-sized loop, negligible)
        y_hat = np.asarray(y_hat_te_full)
        if config.heteroscedastic:
            y_hat, _ = net.likelihood.split(y_hat)
        new = {k: np.array(v, dtype=np.float64) for k, v in metrics.items()}
        for s in range(K):
            mu_y, sd_y = splits[s]["mu_y"], splits[s]["sd_y"]
            y_te = splits[s]["y_te"]
            y_hat_orig = y_hat[s] * sd_y[None] + mu_y[None]
            new["rmse"][s] = np.sqrt(
                np.mean((y_hat_orig.mean(axis=0) - y_te) ** 2)
            )
            log_sd_total = float(np.sum(np.log(sd_y)))
            new["mnll"][s] = metrics["mnll"][s] + len(y_te) * log_sd_total
            new["mnll_per_point"][s] = (
                metrics["mnll_per_point"][s] + log_sd_total
            )
            if "pred_mnll_per_point" in metrics:
                new["pred_mnll_per_point"][s] = (
                    metrics["pred_mnll_per_point"][s] + log_sd_total
                )
            # coverage95 is affine-invariant: keep as computed
        metrics = new

    cal = None
    if config.calibrate:
        Xs_cal = np.stack([d["X_cal"] for d in splits])
        ys_cal_fit = np.stack([d["y_cal_fit"] for d in splits])
        cal_keys = jnp.stack(
            [jax.random.PRNGKey(100000 + s) for s in range(K)]
        )
        mom = jax.jit(jax.vmap(lambda lp, yh: net.likelihood.predict(lp, yh)))
        y_hat_cal = vmapped_predict(
            state.params, jnp.asarray(Xs_cal), cal_keys
        )
        m_c, s_c = mom(state.params["likelihood"], y_hat_cal)
        m_t, s_t = mom(state.params["likelihood"], y_hat_te_full)
        cal = _calibrate_splits(
            [
                (ys_cal_fit[s], m_c[s], s_c[s], ys_te_fit[s], m_t[s], s_t[s])
                for s in range(K)
            ],
            config,
        )

    results = []
    for s in range(K):
        entry = {
            "split": s,
            "rmse": float(metrics["rmse"][s]),
            "mnll": float(metrics["mnll"][s]),
            "mnll_per_point": float(metrics["mnll_per_point"][s]),
            # AMORTIZED, and named so: the whole K-replica stack trained
            # together in `wall` seconds, so `wall / K` is a per-split
            # share, NOT any replica's real wall clock — a consumer
            # comparing against a sequential run's `epochs_per_s` would
            # be comparing different units (round-4 VERDICT weak #7).
            # The true stack wall is `protocol_wall_s` on the aggregate.
            "wall_s_amortized": wall / K,
            "epochs_per_s_amortized": total / max(wall / K, 1e-9),
        }
        if "pred_mnll_per_point" in metrics:
            entry["pred_mnll_per_point"] = float(
                metrics["pred_mnll_per_point"][s]
            )
        if "coverage95" in metrics:
            entry["coverage95"] = float(metrics["coverage95"][s])
        if cal is not None:
            tau, cov_cal, z_te = cal[s]
            entry["temperature"] = tau
            entry["coverage95_cal"] = cov_cal
        results.append(entry)
        if log_fn:
            log_fn(entry)
    out = _aggregate(results)
    if cal is not None:
        _attach_reliability(
            out,
            [z for _, _, z in cal],
            [z / tau for tau, _, z in cal],
        )
        out["calib_pooled"] = bool(config.calib_pooled)
    out["vmapped_splits"] = True
    out["protocol_wall_s"] = wall
    return out


# --------------------------------------------------------- config-stacked grid

# Override keys a config grid may sweep: all shape-preserving scalars.
# Anything else (hidden widths, heteroscedastic, bias, epochs, ...)
# changes the compiled program or the parameter pytree and belongs in a
# separate grid.
_GRID_KEYS = frozenset(
    {
        "sigma0",
        "lambda_hidden",
        "lambda_last",
        "lambda_noise",
        "kl_warmup_frac",
        "noise_freeze_frac",
        "seed",
    }
)


def evaluate_config_grid(
    X: np.ndarray,
    y: np.ndarray,
    base: ProtocolConfig,
    overrides: list,
    ckpt_dir: str | None = None,
    log_fn: Callable[[dict], None] | None = None,
    split_mesh=None,
) -> dict:
    """Run a WHOLE hyperparameter grid as ONE stacked protocol fit.

    Round-4 ran its hetero recipe matrix and calibration rows as ~15
    sequential full-protocol invocations while the vmapped protocol
    idled 98% of the chip (round-5 VERDICT item #2) — but every scalar
    config knob is shape-preserving, so the stacked replica axis
    extends from ``n_splits`` to ``n_configs * n_splits``: per-config
    lambdas enter the loss as traced scalars (WHVINetwork.kl lambda
    overrides), per-config warmup/freeze schedules as traced step
    thresholds (Trainer hyper), per-config sigma0/seed at init. The
    sweep IS the workload; one compile, one launch, every matmul K*C
    wide.

    ``overrides``: one dict per config, keys from {sigma0,
    lambda_hidden, lambda_last, lambda_noise, kl_warmup_frac,
    noise_freeze_frac, seed} — values replace ``base``'s. Per-config
    results are numerically equal to individual
    ``evaluate_bayesian_regression`` runs of the same config (same
    per-replica PRNG keys; tested in tests/test_config_grid.py).

    Returns ``{"configs": [per-config aggregate dicts],
    "protocol_wall_s": stack wall, "stack_size": C*K}``. Structural
    options (calibrate, normalize_y, mesh) are not supported in the
    grid — run those as single configs.
    """
    import jax.numpy as jnp

    from whvi_tpu.train import TrainConfig, Trainer

    for o in overrides:
        bad = set(o) - _GRID_KEYS
        if bad:
            raise ValueError(
                f"config grid can only sweep shape-preserving scalars "
                f"{sorted(_GRID_KEYS)}; got {sorted(bad)}"
            )
    if base.calibrate or base.normalize_y:
        raise ValueError(
            "calibrate/normalize_y are per-split post-processing paths "
            "not supported in the stacked grid; run them as single "
            "configs"
        )
    if base.heteroscedastic and any("sigma0" in o for o in overrides):
        raise ValueError(
            "per-config sigma0 is init+static for the heteroscedastic "
            "likelihood (its split() shift); sweep it homoscedastic or "
            "as separate runs"
        )

    cfgs = [dataclasses.replace(base, **o) for o in overrides]
    C, K = len(cfgs), base.n_splits
    R = C * K

    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.float32)
    y = y if y.ndim > 1 else y[:, None]
    n, n_in = X.shape
    n_out = y.shape[1]
    n_test = max(1, int(round(n * base.test_frac)))
    if base.scale_reference_exact:
        X = standardize(X)

    net = _build_net(base, n_in, n_out)
    total = base.epochs1 + base.epochs2
    n_tr = n - n_test
    B = min(base.batch_size, n_tr)
    steps_per_epoch = -(-n_tr // B)
    # Dispatch-duration guard (shared budget _SAFE_DISPATCH_WORK; see
    # its definition for the measurements). Only ever shrinks the
    # configured chunk.
    epc = min(base.epochs_per_call, _dispatch_chunk_bound(R * n_tr))
    tcfg = TrainConfig(
        batch_size=base.batch_size,
        epochs1=base.epochs1,
        epochs2=base.epochs2,
        epochs_per_call=epc,
        checkpoint_every=base.checkpoint_every,
        ignore_kl=base.ignore_kl,
        # warmup/freeze ride the hyper stack below; statics stay 0
    )
    trainer = Trainer(
        net, tcfg, vmap_splits=True, split_mesh=split_mesh
    )

    # splits are built ONCE from base.seed and shared by every config —
    # a sweep wants identical splits, differing hypers (a per-config
    # `seed` override varies the INIT keys, not the data split)
    rng = np.random.RandomState(base.seed)
    Xs_tr, ys_tr, Xs_te, ys_te = [], [], [], []
    for _ in range(K):
        perm = rng.permutation(n)
        te, tr = perm[:n_test], perm[n_test:]
        X_tr, X_te = X[tr], X[te]
        if not base.scale_reference_exact:
            X_tr, X_te = standardize(X_tr, X_te)
        Xs_tr.append(X_tr)
        ys_tr.append(y[tr])
        Xs_te.append(X_te)
        ys_te.append(y[te])
    # replica r = c * K + s
    Xs_tr = np.tile(np.stack(Xs_tr), (C, 1, 1))
    ys_tr = np.tile(np.stack(ys_tr), (C, 1, 1))
    Xs_te_s = np.stack(Xs_te)
    ys_te_s = np.stack(ys_te)
    Xs_te = np.tile(Xs_te_s, (C, 1, 1))
    ys_te = np.tile(ys_te_s, (C, 1, 1))

    # per-replica hyper stack
    def rep(vals):  # (C,) config scalars -> (R,) replica array
        return np.repeat(np.asarray(vals, np.float32), K)

    hyper = {
        # int() like the single-config path so a grid row equals the
        # standalone run bit-for-bit
        "kl_warmup_steps": rep(
            [
                int(total * steps_per_epoch * c.kl_warmup_frac)
                for c in cfgs
            ]
        )
    }
    if base.heteroscedastic:
        hyper["noise_freeze_steps"] = rep(
            [
                int(total * steps_per_epoch * c.noise_freeze_frac)
                for c in cfgs
            ]
        )
    # per-layer lambda overrides as traced scalars: hidden WHVI layers
    # take lambda_hidden, the head takes lambda_last (and lambda_noise
    # on the split-head noise branch)
    lam_tree = []
    last = len(net.layers) - 1
    for i, l in enumerate(net.layers):
        if hasattr(l, "branches"):
            lam_tree.append(
                (
                    jnp.asarray(rep([c.lambda_last for c in cfgs])),
                    jnp.asarray(rep([c.lambda_noise for c in cfgs])),
                )
            )
        elif hasattr(l, "matrix"):
            key = "lambda_last" if i == last else "lambda_hidden"
            lam_tree.append(
                jnp.asarray(rep([getattr(c, key) for c in cfgs]))
            )
        else:
            lam_tree.append(None)
    hyper["lambdas"] = tuple(lam_tree)

    # init keys: replica (c, s) uses PRNGKey(seed_c * 1000 + s) — the
    # exact key an individual run of config c would give split s
    init_keys = jnp.stack(
        [
            jax.random.PRNGKey(c.seed * 1000 + s)
            for c in cfgs
            for s in range(K)
        ]
    )
    eval_keys = jnp.stack(
        [jax.random.PRNGKey(s) for _ in cfgs for s in range(K)]
    )
    state = trainer.init(init_keys)
    if any("sigma0" in o for o in overrides):
        # homoscedastic sigma0 is pure init: overwrite each replica's
        # likelihood rho with its config's value (Adam state is zeros
        # at init, so this equals having initialized there)
        from whvi_tpu.models.likelihoods import _inv_softplus

        rho = jnp.asarray(
            rep([_inv_softplus(c.sigma0) for c in cfgs])
        )
        params = dict(
            state.params,
            likelihood=dict(state.params["likelihood"], rho=rho),
        )
        state = state._replace(params=params)

    if ckpt_dir:
        import hashlib

        h = hashlib.sha256(
            repr(
                [sorted(dataclasses.asdict(c).items()) for c in cfgs]
            ).encode()
        ).hexdigest()[:10]
        ckpt_dir = os.path.join(ckpt_dir, f"grid-{h}")

    t0 = time.time()
    state, logs = trainer.fit(
        state, Xs_tr, ys_tr, ckpt_dir=ckpt_dir, log_fn=log_fn,
        hyper=hyper,
    )
    wall = time.time() - t0
    metrics = trainer.evaluate(state.params, Xs_te, ys_te, eval_keys)
    if base.heteroscedastic and "rmse" not in metrics:
        vmapped_predict = jax.jit(
            jax.vmap(
                lambda p, x, k: net.predict(p, x, k, base.eval_samples)
            )
        )
        y_hat = vmapped_predict(state.params, jnp.asarray(Xs_te), eval_keys)
        mean, _ = net.likelihood.split(y_hat)
        pred = np.asarray(jnp.mean(mean, axis=1))
        metrics["rmse"] = np.sqrt(
            np.mean((pred - ys_te) ** 2, axis=(1, 2))
        )

    out_configs = []
    for c_i, (cfg, o) in enumerate(zip(cfgs, overrides)):
        results = []
        for s in range(K):
            r = c_i * K + s
            entry = {
                "split": s,
                "rmse": float(metrics["rmse"][r]),
                "mnll": float(metrics["mnll"][r]),
                "mnll_per_point": float(metrics["mnll_per_point"][r]),
                # whole-stack amortized share (see _run_vmapped_protocol)
                "wall_s_amortized": wall / R,
                "epochs_per_s_amortized": total / max(wall / R, 1e-9),
            }
            for k in ("pred_mnll_per_point", "coverage95"):
                if k in metrics:
                    entry[k] = float(metrics[k][r])
            results.append(entry)
            if log_fn:
                log_fn(dict(entry, config=c_i))
        agg = _aggregate(results)
        agg["config_overrides"] = dict(o)
        out_configs.append(agg)
    return {
        "configs": out_configs,
        "protocol_wall_s": wall,
        "stack_size": R,
        "n_configs": C,
        "vmapped_splits": True,
    }
