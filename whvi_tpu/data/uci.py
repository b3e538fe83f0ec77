"""UCI regression dataset loaders (the reference experiment suite).

Counterparts of the reference's per-dataset runner loaders
(experiments/regression_experiments/run_{boston,concrete,energy,yacht,
kin8nm,naval}.py). Each loader returns ``(X, y)`` float32 arrays with
``y`` 2-D.

File resolution order for each dataset file:
  1. ``$WHVI_DATA_DIR``
  2. ``<repo>/data/``
  3. ``/root/reference/experiments/datasets`` (read-only bundled copies,
     when present)

Files that the reference downloads at first use (kin8nm from OpenML,
naval from UCI — run_kin8nm.py:1-28, run_naval.py:1-40) cannot be
fetched in a zero-egress environment; their loaders raise a clear
``FileNotFoundError`` naming the expected file and source URL instead.
``boston`` likewise expects the classic ``housing.data`` whitespace
format (sklearn removed ``load_boston``).
"""

from __future__ import annotations

import os

import numpy as np

from whvi_tpu.data.sheets import read_xls_numeric, read_xlsx_numeric

__all__ = ["load_uci", "UCI_DATASETS", "dataset_info"]

_SEARCH_DIRS = [
    os.environ.get("WHVI_DATA_DIR", ""),
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data"
    ),
    "/root/reference/experiments/datasets",
]


def _find(*names: str) -> str:
    for d in _SEARCH_DIRS:
        if not d:
            continue
        for name in names:
            p = os.path.join(d, name)
            if os.path.exists(p):
                return p
    raise FileNotFoundError(
        f"none of {names} found in {[d for d in _SEARCH_DIRS if d]}; "
        "set WHVI_DATA_DIR or place the file in <repo>/data/"
    )


def _split_xy(table: np.ndarray, n_targets: int = 1):
    X = table[:, :-n_targets].astype(np.float32)
    y = table[:, -n_targets:].astype(np.float32)
    return X, y


def load_boston():
    """Boston housing: 506 x 13 -> 1. Classic ``housing.data`` layout
    (whitespace, MEDV last); reference used sklearn.load_boston
    (run_boston.py:1-20), removed from modern sklearn."""
    path = _find("housing.data", "boston.data", "boston.csv")
    if path.endswith(".csv"):
        table = np.genfromtxt(path, delimiter=",", skip_header=1)
    else:
        table = np.loadtxt(path)
    return _split_xy(table)


def load_concrete():
    """Concrete compressive strength: 1030 x 8 -> 1 (bundled
    Concrete_Data.xls, reference run_concrete.py)."""
    table = read_xls_numeric(_find("Concrete_Data.xls"))
    return _split_xy(table)


def load_energy():
    """Energy efficiency (ENB2012): 768 x 8 -> 2 targets (heating +
    cooling load; reference run_energy.py uses both)."""
    table = read_xlsx_numeric(_find("ENB2012_data.xlsx"))
    return _split_xy(table, n_targets=2)


def load_yacht():
    """Yacht hydrodynamics: 308 x 6 -> 1 (reference run_yacht.py)."""
    table = np.loadtxt(_find("yacht_hydrodynamics.data"))
    return _split_xy(table)


def load_kin8nm():
    """kin8nm: 8192 x 8 -> 1. Reference downloads from OpenML
    (run_kin8nm.py); zero-egress here, so the CSV must be provided
    (openml.org dataset 189, 'dataset_2175_kin8nm.csv')."""
    path = _find("dataset_2175_kin8nm.csv", "kin8nm.csv")
    table = np.genfromtxt(path, delimiter=",", skip_header=1)
    return _split_xy(table)


def load_naval():
    """Naval propulsion (UCI CBM): 11934 x 16 -> 2 compressor/turbine
    decay coefficients. Reference downloads + unzips the UCI archive
    (run_naval.py)."""
    path = _find("naval_data.txt", os.path.join("UCI CBM Dataset", "data.txt"))
    table = np.loadtxt(path)
    return _split_xy(table, n_targets=2)


def load_protein():
    """Protein tertiary structure (CASP): 45730 x 9 -> 1 (RMSD is the
    FIRST column in the UCI CSV). BASELINE.json deep-MLP config."""
    path = _find("CASP.csv", "protein.csv")
    table = np.genfromtxt(path, delimiter=",", skip_header=1)
    X = table[:, 1:].astype(np.float32)
    y = table[:, :1].astype(np.float32)
    return X, y


def load_diabetes_sk():
    """Diabetes progression (Efron et al.): 442 x 10 -> 1. Bundled with
    scikit-learn, so it is a REAL regression dataset available in this
    zero-egress environment — an extension beyond the reference's six
    runners that lets the protocol be measured on more than three real
    datasets here. Raw (unstandardized-target) units."""
    from sklearn.datasets import load_diabetes

    d = load_diabetes(scaled=False)
    return d.data.astype(np.float32), d.target.astype(np.float32)[:, None]


def load_linnerud_sk():
    """Linnerud exercise physiology: 20 x 3 -> 3. Tiny, but REAL
    multi-output regression bundled with scikit-learn — the only
    offline real dataset here exercising n_out > 2 end-to-end (energy
    has 2 targets). Targets: weight, waist, pulse."""
    from sklearn.datasets import load_linnerud

    d = load_linnerud()
    return d.data.astype(np.float32), d.target.astype(np.float32)


UCI_DATASETS = {
    "boston": load_boston,
    "concrete": load_concrete,
    "energy": load_energy,
    "yacht": load_yacht,
    "kin8nm": load_kin8nm,
    "naval": load_naval,
    "protein": load_protein,
    # real offline extras (not in the reference's six)
    "diabetes": load_diabetes_sk,
    "linnerud": load_linnerud_sk,
}


def dataset_info(name: str) -> dict:
    """Shapes/availability without loading errors."""
    try:
        X, y = load_uci(name)
        return {
            "name": name,
            "available": True,
            "n": X.shape[0],
            "n_in": X.shape[1],
            "n_out": y.shape[1],
        }
    except FileNotFoundError as e:
        return {"name": name, "available": False, "reason": str(e)}


def load_uci(name: str):
    if name not in UCI_DATASETS:
        raise KeyError(
            f"unknown dataset {name!r}; have {sorted(UCI_DATASETS)}"
        )
    return UCI_DATASETS[name]()
