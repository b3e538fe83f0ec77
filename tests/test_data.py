"""Data subsystem tests: spreadsheet parsers, UCI registry, toy sets,
synthetic classification."""

import os

import numpy as np
import pytest

from whvi_tpu.data import cubic_data, polynomial_data
from whvi_tpu.data.mnist import synthetic_classification
from whvi_tpu.data.uci import UCI_DATASETS, dataset_info, load_uci

_REF = "/root/reference/experiments/datasets"


def test_cubic_data_shapes_and_function():
    (X_tr, y_tr), (X_te, y_te) = cubic_data(seed=0)
    assert X_tr.shape == (150, 3) and y_tr.shape == (150, 1)
    assert X_te.shape == (50, 3) and y_te.shape == (50, 1)
    # y = x0 + x1^2 - 0.3 x2^3 exactly (no observation noise in the
    # reference README example)
    want = (
        X_tr[:, 0] + X_tr[:, 1] ** 2 - 0.3 * X_tr[:, 2] ** 3
    ).reshape(-1, 1)
    np.testing.assert_allclose(y_tr, want, rtol=1e-5)


def test_polynomial_data_gap():
    X, y = polynomial_data(seed=1)
    assert X.shape == (128, 1) and y.shape == (128, 1)
    # no points inside the [0.6, 1.4] gap (in-between uncertainty setup)
    assert not np.any((X > 0.6) & (X < 1.4))
    assert np.all(np.abs(X) <= 2.0)


def test_synthetic_classification():
    (Xtr, ytr), (Xte, yte) = synthetic_classification(
        n_train=128, n_test=32, n_in=20, n_classes=4
    )
    assert Xtr.shape == (128, 20) and ytr.shape == (128,)
    assert set(np.unique(ytr)) <= set(range(4))


def test_uci_registry_complete():
    # every dataset family the reference ships runners for, plus protein
    # and the sklearn-bundled extras (diabetes round 2, linnerud round 4)
    assert set(UCI_DATASETS) == {
        "diabetes",
        "boston",
        "concrete",
        "energy",
        "yacht",
        "kin8nm",
        "naval",
        "protein",
        "linnerud",
    }


@pytest.mark.skipif(
    not os.path.isdir(_REF), reason="bundled reference datasets absent"
)
def test_bundled_datasets_load():
    X, y = load_uci("yacht")
    assert X.shape == (308, 6) and y.shape == (308, 1)
    X, y = load_uci("concrete")
    assert X.shape == (1030, 8) and y.shape == (1030, 1)
    # spot-check a known concrete value (row 0 strength ~ 79.99)
    assert abs(float(y[0, 0]) - 79.99) < 0.1
    X, y = load_uci("energy")
    assert X.shape == (768, 8) and y.shape == (768, 2)


def test_dataset_info_unavailable_is_graceful():
    info = dataset_info("kin8nm")
    assert info["name"] == "kin8nm"
    assert "available" in info


def test_unknown_dataset_raises():
    with pytest.raises(KeyError):
        load_uci("nope")


def test_diabetes_loader_real_offline():
    # sklearn-bundled real regression data (round-2 coverage extension)
    from whvi_tpu.data.uci import load_uci

    X, y = load_uci("diabetes")
    assert X.shape == (442, 10) and y.shape == (442, 1)
    assert float(y.mean()) > 100.0  # raw units, not standardized


def test_digits_loader_real_offline():
    from whvi_tpu.data.mnist import load_digits_classification

    (Xtr, ytr), (Xte, yte) = load_digits_classification(seed=3)
    assert Xtr.shape[1] == 64 and Xte.shape[1] == 64
    assert set(np.unique(ytr)) == set(range(10))
    assert 0.0 <= Xtr.min() and Xtr.max() <= 1.0
    # deterministic split per seed
    (Xtr2, _), _ = load_digits_classification(seed=3)
    np.testing.assert_array_equal(Xtr, Xtr2)


def test_sklearn_classification_loaders_real_offline():
    from whvi_tpu.data.mnist import load_sklearn_classification

    (Xtr, ytr), (Xte, yte) = load_sklearn_classification("wine", seed=1)
    assert Xtr.shape[1] == 13 and set(np.unique(ytr)) <= set(range(3))
    # standardized on the train split
    np.testing.assert_allclose(Xtr.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(Xtr.std(axis=0), 1.0, atol=1e-3)

    (Xtr2, ytr2), _ = load_sklearn_classification("breast_cancer", seed=1)
    assert Xtr2.shape[1] == 30 and set(np.unique(ytr2)) == {0, 1}

    import pytest

    with pytest.raises(ValueError):
        load_sklearn_classification("nope")


def test_linnerud_loads_multi_output():
    from whvi_tpu.data.uci import load_uci

    X, y = load_uci("linnerud")
    assert X.shape == (20, 3) and y.shape == (20, 3)
    assert np.isfinite(X).all() and np.isfinite(y).all()
