"""Config-stacked protocol grid: per-config results must equal
individual protocol runs (round-5 VERDICT item #2)."""

import dataclasses

import numpy as np
import pytest

from whvi_tpu.evaluation import (
    ProtocolConfig,
    evaluate_bayesian_regression,
    evaluate_config_grid,
)


def _data(n=110, d=4, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d).astype(np.float32)
    y = (X[:, :1] - 0.5 * X[:, 1:2] + 0.2 * rng.randn(n, 1)).astype(
        np.float32
    )
    return X, y


BASE = dict(
    n_splits=2,
    epochs1=5,
    epochs2=25,
    hidden=(8,),
    checkpoint_every=0,
    epochs_per_call=15,
)


def test_grid_matches_individual_runs():
    X, y = _data()
    base = ProtocolConfig(**BASE, kl_warmup_frac=0.3)
    overrides = [
        {},  # the base itself
        {"lambda_hidden": 0.5, "sigma0": 0.4},
        {"kl_warmup_frac": 0.0},
        # NOTE grid `seed` semantics: varies the INIT keys only — the
        # data splits stay the base's (a sweep wants identical splits),
        # so this row has no standalone-run counterpart to equal
        {"seed": 3},
    ]
    grid = evaluate_config_grid(X, y, base, overrides)
    assert grid["stack_size"] == 8 and grid["n_configs"] == 4
    for o, got in zip(overrides[:3], grid["configs"][:3]):
        want = evaluate_bayesian_regression(
            X, y, dataclasses.replace(base, **o)
        )
        for a, b in zip(got["splits"], want["splits"]):
            np.testing.assert_allclose(
                a["rmse"], b["rmse"], rtol=2e-4, atol=1e-6
            )
            np.testing.assert_allclose(
                a["mnll"], b["mnll"], rtol=2e-4, atol=1e-5
            )
        assert got["config_overrides"] == o
    # the sweep must actually differ across configs, and the seed row
    # must differ from the identically-configured base row (different
    # init draw, same splits)
    mnlls = [c["mnll_mean"] for c in grid["configs"]]
    assert len({round(m, 6) for m in mnlls}) > 2
    assert (
        grid["configs"][3]["mnll_mean"] != grid["configs"][0]["mnll_mean"]
    )


def test_grid_heteroscedastic_freeze_sweep():
    X, y = _data(seed=1)
    base = ProtocolConfig(
        **BASE,
        heteroscedastic=True,
        kl_warmup_frac=0.2,
        noise_freeze_frac=0.5,
    )
    overrides = [
        {"noise_freeze_frac": 0.0},
        {"noise_freeze_frac": 0.5, "lambda_noise": 0.1},
    ]
    grid = evaluate_config_grid(X, y, base, overrides)
    for o, got in zip(overrides, grid["configs"]):
        want = evaluate_bayesian_regression(
            X, y, dataclasses.replace(base, **o)
        )
        for a, b in zip(got["splits"], want["splits"]):
            np.testing.assert_allclose(
                a["rmse"], b["rmse"], rtol=2e-4, atol=1e-6
            )
            np.testing.assert_allclose(
                a["mnll"], b["mnll"], rtol=2e-4, atol=1e-5
            )


def test_grid_rejects_bad_overrides():
    X, y = _data()
    base = ProtocolConfig(**BASE)
    with pytest.raises(ValueError, match="shape-preserving"):
        evaluate_config_grid(X, y, base, [{"hidden": (16,)}])
    with pytest.raises(ValueError, match="calibrate"):
        evaluate_config_grid(
            X,
            y,
            dataclasses.replace(base, calibrate=True),
            [{}],
        )
    with pytest.raises(ValueError, match="sigma0"):
        evaluate_config_grid(
            X,
            y,
            dataclasses.replace(base, heteroscedastic=True),
            [{"sigma0": 0.5}],
        )


def test_grid_on_split_mesh():
    # the replica axis (C*K = 4) shards over a 4-device ("split",) mesh
    import jax
    from jax.sharding import Mesh

    X, y = _data(seed=2)
    base = ProtocolConfig(**BASE)
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("split",))
    grid = evaluate_config_grid(
        X, y, base, [{}, {"lambda_hidden": 0.5}], split_mesh=mesh
    )
    plain = evaluate_config_grid(X, y, base, [{}, {"lambda_hidden": 0.5}])
    for a, b in zip(grid["configs"], plain["configs"]):
        np.testing.assert_allclose(
            a["rmse_mean"], b["rmse_mean"], rtol=1e-5
        )
