"""MNIST loader (IDX format) with a synthetic classification fallback.

The BASELINE.json MNIST config needs a Bayesian classifier experiment;
this environment is zero-egress, so :func:`load_mnist` reads the
standard IDX files (optionally gzipped) from the usual search dirs and
:func:`synthetic_classification` provides a structured stand-in (random
class prototypes + noise) so the classifier pipeline runs end-to-end
anywhere.
"""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np

__all__ = [
    "load_mnist",
    "load_digits_classification",
    "load_sklearn_classification",
    "synthetic_classification",
    "mnist_available",
]

_SEARCH_DIRS = [
    os.environ.get("WHVI_DATA_DIR", ""),
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "data",
        "mnist",
    ),
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data"
    ),
]

_FILES = {
    "train_images": ("train-images-idx3-ubyte", "train-images.idx3-ubyte"),
    "train_labels": ("train-labels-idx1-ubyte", "train-labels.idx1-ubyte"),
    "test_images": ("t10k-images-idx3-ubyte", "t10k-images.idx3-ubyte"),
    "test_labels": ("t10k-labels-idx1-ubyte", "t10k-labels.idx1-ubyte"),
}


def _find(names) -> str | None:
    for d in _SEARCH_DIRS:
        if not d:
            continue
        for name in names:
            for suffix in ("", ".gz"):
                p = os.path.join(d, name + suffix)
                if os.path.exists(p):
                    return p
    return None


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    zero, dtype_code, ndim = data[0] << 8 | data[1], data[2], data[3]
    del zero, dtype_code
    dims = struct.unpack_from(f">{ndim}I", data, 4)
    arr = np.frombuffer(data, np.uint8, offset=4 + 4 * ndim)
    return arr.reshape(dims)


def mnist_available() -> bool:
    return all(_find(v) is not None for v in _FILES.values())


def load_mnist(flatten: bool = True):
    """((X_train, y_train), (X_test, y_test)); X in [0, 1] float32."""
    paths = {k: _find(v) for k, v in _FILES.items()}
    missing = [k for k, p in paths.items() if p is None]
    if missing:
        raise FileNotFoundError(
            f"MNIST files missing: {missing}; place IDX files under "
            f"{[d for d in _SEARCH_DIRS if d]} (yann.lecun.com/exdb/mnist)"
        )
    Xtr = _read_idx(paths["train_images"]).astype(np.float32) / 255.0
    ytr = _read_idx(paths["train_labels"]).astype(np.int32)
    Xte = _read_idx(paths["test_images"]).astype(np.float32) / 255.0
    yte = _read_idx(paths["test_labels"]).astype(np.int32)
    if flatten:
        Xtr = Xtr.reshape(len(Xtr), -1)
        Xte = Xte.reshape(len(Xte), -1)
    return (Xtr, ytr), (Xte, yte)


def synthetic_classification(
    n_train: int = 4096,
    n_test: int = 1024,
    n_in: int = 784,
    n_classes: int = 10,
    noise: float = 2.0,
    seed: int = 0,
):
    """Class-prototype + Gaussian-noise classification data with MNIST's
    default shapes; linearly separable-ish at the default noise."""
    rng = np.random.RandomState(seed)
    protos = rng.randn(n_classes, n_in).astype(np.float32)

    def make(n):
        y = rng.randint(0, n_classes, size=n).astype(np.int32)
        X = protos[y] + noise * rng.randn(n, n_in).astype(np.float32)
        return X.astype(np.float32), y

    return make(n_train), make(n_test)


def load_digits_classification(test_frac: float = 0.2, seed: int = 0):
    """REAL classification data available offline: scikit-learn's bundled
    8x8 handwritten-digits set (1797 samples, 10 classes, UCI Optical
    Recognition of Handwritten Digits). Used to validate the Bayesian
    classifier on real data when the full MNIST IDX files are absent
    (zero-egress environment). Returns ((X_tr, y_tr), (X_te, y_te)),
    X in [0, 1] float32, flattened 64-dim."""
    from sklearn.datasets import load_digits

    d = load_digits()
    X = (d.data / 16.0).astype(np.float32)
    y = d.target.astype(np.int32)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(len(X))
    n_te = int(round(test_frac * len(X)))
    te, tr = perm[:n_te], perm[n_te:]
    return (X[tr], y[tr]), (X[te], y[te])


def load_sklearn_classification(
    name: str, test_frac: float = 0.2, seed: int = 0
):
    """Other REAL classification sets bundled with scikit-learn (offline):
    ``wine`` (178 samples, 13 features, 3 classes) and ``breast_cancer``
    (569 samples, 30 features, 2 classes). Features are standardized on
    the train split (ranges vary over orders of magnitude, unlike the
    [0,1] digits pixels). Returns ((X_tr, y_tr), (X_te, y_te))."""
    from sklearn import datasets as skd

    loaders = {
        "wine": skd.load_wine,
        "breast_cancer": skd.load_breast_cancer,
    }
    if name not in loaders:
        raise ValueError(f"unknown sklearn set {name!r}; have {sorted(loaders)}")
    d = loaders[name]()
    X = d.data.astype(np.float32)
    y = d.target.astype(np.int32)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(len(X))
    n_te = int(round(test_frac * len(X)))
    te, tr = perm[:n_te], perm[n_te:]
    mu = X[tr].mean(axis=0)
    sd = X[tr].std(axis=0) + 1e-8
    X = (X - mu) / sd
    return (X[tr], y[tr]), (X[te], y[te])
