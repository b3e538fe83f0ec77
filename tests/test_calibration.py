"""Predictive-variance calibration (temperature scaling) tests."""

import numpy as np
import pytest

from whvi_tpu.calibration import (
    coverage,
    fit_temperature,
    reliability_table,
    table_from_z,
)
from whvi_tpu.evaluation import ProtocolConfig, evaluate_bayesian_regression


def test_fit_temperature_recovers_known_scale():
    # Targets drawn with TRUE sd = 2 * predicted sd: the closed-form ML
    # temperature must recover tau ~= 2 (and ~0.5 in the opposite case).
    rng = np.random.RandomState(0)
    n = 20000
    mean = rng.randn(n)
    sd = 0.5 + rng.rand(n)
    y = mean + 2.0 * sd * rng.randn(n)
    tau = fit_temperature(y, mean, sd)
    assert abs(tau - 2.0) < 0.05
    y_tight = mean + 0.5 * sd * rng.randn(n)
    assert abs(fit_temperature(y_tight, mean, sd) - 0.5) < 0.02


def test_tempered_coverage_hits_nominal():
    rng = np.random.RandomState(1)
    n = 20000
    mean = np.zeros(n)
    sd = np.ones(n)
    y = 2.0 * rng.randn(n)  # model is 2x over-confident
    raw = coverage(y, mean, sd, level=0.95)
    assert raw < 0.75  # badly under-covering
    tau = fit_temperature(y, mean, sd)
    cal = coverage(y, mean, sd, level=0.95, tau=tau)
    assert abs(cal - 0.95) < 0.01


def test_reliability_table_calibrated_gaussian():
    rng = np.random.RandomState(2)
    z = rng.randn(50000)
    for row in table_from_z(z):
        assert abs(row["empirical"] - row["nominal"]) < 0.01
    # reliability_table == table_from_z on the same z-scores
    tab = reliability_table(z, np.zeros_like(z), np.ones_like(z))
    for a, b in zip(tab, table_from_z(z)):
        assert a["nominal"] == b["nominal"]
        assert abs(a["empirical"] - b["empirical"]) < 1e-12


def _data(n=120, d=4, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d).astype(np.float32)
    y = (X[:, :1] + 0.3 * rng.randn(n, 1)).astype(np.float32)
    return X, y


@pytest.mark.parametrize("vmapped", [True, False])
def test_protocol_calibration_outputs(vmapped):
    X, y = _data()
    cfg = ProtocolConfig(
        n_splits=2,
        epochs1=0,
        epochs2=20,
        hidden=(8,),
        checkpoint_every=0,
        kl_warmup_frac=0.0,
        calibrate=True,
        calib_frac=0.15,
        vmap_splits=vmapped,
    )
    out = evaluate_bayesian_regression(X, y, cfg)
    assert np.isfinite(out["temperature_mean"])
    assert 0.0 <= out["coverage95_cal_mean"] <= 1.0
    assert len(out["reliability_raw"]) == 10
    assert len(out["reliability_cal"]) == 10
    for r in out["splits"]:
        assert "temperature" in r and "coverage95_cal" in r


def test_protocol_calibration_vmapped_matches_sequential():
    X, y = _data()
    base = dict(
        n_splits=2,
        epochs1=0,
        epochs2=15,
        hidden=(8,),
        checkpoint_every=0,
        kl_warmup_frac=0.0,
        calibrate=True,
        calib_frac=0.15,
    )
    out_seq = evaluate_bayesian_regression(
        X, y, ProtocolConfig(**base, vmap_splits=False)
    )
    out_vm = evaluate_bayesian_regression(
        X, y, ProtocolConfig(**base, vmap_splits=True)
    )
    for a, b in zip(out_seq["splits"], out_vm["splits"]):
        np.testing.assert_allclose(
            a["temperature"], b["temperature"], rtol=1e-5
        )
        np.testing.assert_allclose(
            a["coverage95_cal"], b["coverage95_cal"], rtol=1e-6
        )


def test_quantile_temperature_targets_coverage():
    # Quantile-matched tau must put coverage at the nominal level even
    # when the predictive is non-Gaussian (heavy-tailed), where ML tau
    # (z^2-mean) is pulled by the tails.
    from whvi_tpu.calibration import fit_temperature_quantile

    rng = np.random.RandomState(3)
    n = 40000
    mean = np.zeros(n)
    sd = np.ones(n)
    y = rng.standard_t(df=3, size=n)  # heavy tails
    tau_q = fit_temperature_quantile(y, mean, sd, level=0.95)
    cov_q = coverage(y, mean, sd, level=0.95, tau=tau_q)
    assert abs(cov_q - 0.95) < 0.01
    tau_ml = fit_temperature(y, mean, sd)
    cov_ml = coverage(y, mean, sd, level=0.95, tau=tau_ml)
    assert abs(cov_ml - 0.95) > abs(cov_q - 0.95)


def test_protocol_calib_mode_flag():
    X, y = _data()
    base = dict(
        n_splits=1,
        epochs1=0,
        epochs2=10,
        hidden=(8,),
        checkpoint_every=0,
        kl_warmup_frac=0.0,
        calibrate=True,
        calib_frac=0.2,
    )
    out_q = evaluate_bayesian_regression(
        X, y, ProtocolConfig(**base, calib_mode="quantile")
    )
    out_n = evaluate_bayesian_regression(
        X, y, ProtocolConfig(**base, calib_mode="nll")
    )
    # different fit rules -> (generically) different temperatures
    assert out_q["temperature_mean"] != out_n["temperature_mean"]


def test_protocol_calibrate_with_normalize_y_and_hetero():
    # calibration composes with normalize-y + heteroscedastic (z-scores
    # are affine-invariant, so the fit-unit tau IS the original-unit
    # tau); both protocol paths must agree.
    X, y = _data()
    y = y * 30.0 + 50.0
    base = dict(
        n_splits=2,
        epochs1=0,
        epochs2=12,
        hidden=(8,),
        checkpoint_every=0,
        kl_warmup_frac=0.0,
        normalize_y=True,
        heteroscedastic=True,
        calibrate=True,
        calib_frac=0.2,
    )
    out_seq = evaluate_bayesian_regression(
        X, y, ProtocolConfig(**base, vmap_splits=False)
    )
    out_vm = evaluate_bayesian_regression(
        X, y, ProtocolConfig(**base, vmap_splits=True)
    )
    for a, b in zip(out_seq["splits"], out_vm["splits"]):
        np.testing.assert_allclose(
            a["temperature"], b["temperature"], rtol=1e-5
        )
        np.testing.assert_allclose(
            a["coverage95_cal"], b["coverage95_cal"], rtol=1e-6
        )
    assert np.isfinite(out_vm["temperature_mean"])


def test_quantile_tiny_calib_set_falls_back_to_ml():
    # linnerud-class case: n_cal=2 -> the 0.95 quantile IS the sample
    # max; the fit must warn and fall back to the closed-form ML tau
    from whvi_tpu.calibration import (
        fit_temperature,
        fit_temperature_quantile,
    )

    y = np.array([0.1, -0.4])
    mean = np.zeros(2)
    sd = np.ones(2)
    with pytest.warns(UserWarning, match="falling back to the ML tau"):
        tau = fit_temperature_quantile(y, mean, sd)
    assert tau == pytest.approx(fit_temperature(y, mean, sd))


def test_protocol_calib_pooled_shares_one_tau():
    X, y = _data()
    base = dict(
        n_splits=3,
        epochs1=0,
        epochs2=15,
        hidden=(8,),
        checkpoint_every=0,
        kl_warmup_frac=0.0,
        calibrate=True,
        calib_frac=0.2,
    )
    out = evaluate_bayesian_regression(
        X, y, ProtocolConfig(**base, calib_pooled=True)
    )
    taus = [r["temperature"] for r in out["splits"]]
    assert len(set(taus)) == 1  # one shared tau
    assert out["calib_pooled"] is True
    assert out["temperature_sd"] == 0.0
    # per-split mode generically differs across splits
    out_ps = evaluate_bayesian_regression(
        X, y, ProtocolConfig(**base, calib_pooled=False)
    )
    taus_ps = [r["temperature"] for r in out_ps["splits"]]
    assert len(set(taus_ps)) > 1
    # both protocol paths agree under pooling too
    out_seq = evaluate_bayesian_regression(
        X,
        y,
        ProtocolConfig(**base, calib_pooled=True, vmap_splits=False),
    )
    for a, b in zip(out["splits"], out_seq["splits"]):
        np.testing.assert_allclose(
            a["temperature"], b["temperature"], rtol=1e-5
        )


def test_logit_temperature_grid_edge_guard():
    from whvi_tpu.calibration import fit_logit_temperature

    rng = np.random.RandomState(7)
    n, C = 400, 4
    labels = rng.randint(0, C, size=n)
    # perfectly separable logits: in-sample NLL rewards sharpening
    # without bound -> argmin at the sharp grid edge -> refuse + flag
    logits = np.full((1, n, C), -4.0)
    logits[0, np.arange(n), labels] = 4.0
    with pytest.warns(UserWarning, match="grid edge"):
        info = fit_logit_temperature(
            logits, labels, objective="nll", return_info=True
        )
    assert info["tau_at_edge"] is True
    assert info["tau"] == 1.0
    assert info["tau_raw"] != 1.0
    # interior optimum keeps the fitted value and stays un-flagged
    true_logits = rng.randn(5000, C) * 2.0
    p_true = np.exp(true_logits)
    p_true /= p_true.sum(axis=1, keepdims=True)
    labels2 = np.array([rng.choice(C, p=p) for p in p_true])
    info2 = fit_logit_temperature(
        true_logits[None] * 3.0, labels2, return_info=True
    )
    assert info2["tau_at_edge"] is False
    assert 2.0 < info2["tau"] < 4.5


def test_ece_and_logit_temperature():
    from whvi_tpu.calibration import (
        expected_calibration_error,
        fit_logit_temperature,
    )

    rng = np.random.RandomState(5)
    n, C = 6000, 5
    # well-specified logits scaled 3x hotter than truth: overconfident
    true_logits = rng.randn(n, C) * 2.0
    p_true = np.exp(true_logits)
    p_true /= p_true.sum(axis=1, keepdims=True)
    labels = np.array([rng.choice(C, p=p) for p in p_true])
    hot = true_logits[None] * 3.0  # (S=1, N, C) overconfident logits

    tau = fit_logit_temperature(hot, labels)
    assert 2.0 < tau < 4.5  # recovers ~3

    def probs(logits, t):
        z = logits / t
        z = z - z.max(axis=-1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=-1, keepdims=True)
        return p.mean(axis=0)

    ece_raw = expected_calibration_error(probs(hot, 1.0), labels)
    ece_cal = expected_calibration_error(probs(hot, tau), labels)
    assert ece_cal < 0.5 * ece_raw
    # perfectly calibrated probabilities give small ECE
    assert expected_calibration_error(p_true, labels) < 0.03
