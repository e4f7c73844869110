"""Dataset loading for the Bayesian-posterior targets.

The reference bundles UCI data files with its package
(reference: src/gmmvi/experiments/target_distributions/datasets/).  Here we
resolve datasets from, in order:

1. an explicit path in the ``GMMVI_DATASETS`` environment variable,
2. this package's ``datasets/`` directory (UCI breast-cancer / german-credit
   and the wine splits ship with the package, same files the reference
   bundles),
3. scikit-learn's bundled copy (breast cancer only — the identical UCI WDBC
   data).

A missing dataset raises a clear error.  Setting ``GMMVI_ALLOW_SYNTHETIC=1``
instead substitutes a deterministic synthetic stand-in with identical shapes
(clearly flagged) so hermetic environments stay runnable — but such runs are
NOT reproductions of the reference experiments.
"""
from __future__ import annotations

import os
import warnings
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_PKG_DATA = Path(__file__).parent / "datasets"


def _search_paths(filename: str):
    env = os.environ.get("GMMVI_DATASETS")
    if env:
        yield Path(env) / filename
    yield _PKG_DATA / filename


def _find(filename: str) -> Optional[Path]:
    for p in _search_paths(filename):
        if p.exists():
            return p
    return None


def _missing(name: str, filename: str) -> None:
    """Raise unless synthetic stand-ins are explicitly allowed."""
    if os.environ.get("GMMVI_ALLOW_SYNTHETIC") == "1":
        warnings.warn(f"{name} dataset unavailable; using synthetic stand-in")
        return
    raise FileNotFoundError(
        f"{name} dataset not found: place '{filename}' under "
        f"{_PKG_DATA} or a directory named by GMMVI_DATASETS, or set "
        f"GMMVI_ALLOW_SYNTHETIC=1 to run on a synthetic stand-in "
        f"(NOT a reproduction of the reference experiment)."
    )


def load_breast_cancer() -> Tuple[np.ndarray, np.ndarray]:
    """UCI WDBC: (X [569, 30], labels [569]); labels 0 = malignant.

    Matches the file layout the reference loads at
    logistic_regression.py:24-34 (id, label, 30 features).
    """
    p = _find("breast_cancer.data")
    if p is not None:
        data = np.loadtxt(str(p))
        return data[:, 2:], data[:, 1]
    try:
        from sklearn.datasets import load_breast_cancer as _sk

        ds = _sk()
        # sklearn target: 0 = malignant — same coding as the reference file
        return ds.data.astype(np.float64), ds.target.astype(np.float64)
    except Exception:
        pass
    _missing("breast_cancer", "breast_cancer.data")
    return _synthetic_classification(569, 30, seed=0)


def load_german_credit() -> Tuple[np.ndarray, np.ndarray]:
    """UCI German credit (numeric): (X [1000, 24], labels in {0, 1}).

    The reference loads ``german.data-numeric`` whose last column is the label
    in {1, 2} (logistic_regression.py:36-45, label = col - 1).
    """
    p = _find("german.data-numeric")
    if p is not None:
        data = np.loadtxt(str(p))
        return data[:, :-1], data[:, -1] - 1
    _missing("german_credit", "german.data-numeric")
    return _synthetic_classification(1000, 24, seed=1)


def load_wine_split(dataset_seed: int):
    """Wine-quality regression splits (train/vali/test), standardized features.

    The reference pre-generates ``wine_seed_{0..9}.npz`` from
    tensorflow-datasets (bnn.py:32-57).  Same npz schema here; synthesized
    deterministically when no file is found.
    """
    fname = os.path.join("wine", f"wine_seed_{dataset_seed % 10}.npz")
    p = _find(fname)
    if p is not None:
        d = np.load(str(p))
        return {k: np.asarray(d[k]) for k in d.files}
    _missing("wine", fname)
    rng = np.random.RandomState(1234 + dataset_seed % 10)
    n, f = 4898, 11
    x = rng.standard_normal((n, f))
    w = rng.standard_normal(f)
    y = x @ w * 0.5 + 6.0 + 0.7 * rng.standard_normal(n)
    x = (x - x.mean(0)) / x.std(0)
    tr, te = int(n * 0.6), int(n * 0.2)
    return {
        "features_train": x[:tr].astype(np.float32),
        "features_test": x[tr:tr + te].astype(np.float32),
        "features_vali": x[tr + te:].astype(np.float32),
        "labels_train": y[:tr].astype(np.float32),
        "labels_test": y[tr:tr + te].astype(np.float32),
        "labels_vali": y[tr + te:].astype(np.float32),
    }


def _mnist_from_npz(d) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Accept either this package's flat schema (train_x [N, 784] float in
    [0, 1]) or the standard keras archive schema (x_train [N, 28, 28]
    uint8)."""
    keys = d.files if hasattr(d, "files") else d.keys()
    if "train_x" in keys:
        return d["train_x"], d["train_y"], d["test_x"], d["test_y"]
    to_flat = lambda x: (np.asarray(x, np.float32) / 255.0).reshape(
        x.shape[0], -1)
    return (to_flat(d["x_train"]), np.asarray(d["y_train"]),
            to_flat(d["x_test"]), np.asarray(d["y_test"]))


def load_mnist():
    """(train_x [N, 784], train_y, test_x, test_y) in [0, 1].

    Resolution order: ``mnist.npz`` under GMMVI_DATASETS / the package data
    dir (either this package's flat schema or the standard keras archive —
    fetch one with ``python scripts/fetch_mnist.py``), the keras download
    cache (``~/.keras/datasets/mnist.npz``), then a live
    ``keras.datasets.mnist.load_data()`` (auto-downloads when the
    environment has network).  The reference pulls MNIST through
    tensorflow-datasets at runtime (bnn.py:320-336)."""
    p = _find("mnist.npz")
    if p is None:
        keras_cache = Path.home() / ".keras" / "datasets" / "mnist.npz"
        if keras_cache.exists():
            p = keras_cache
    if p is not None:
        with np.load(str(p), allow_pickle=True) as d:
            return _mnist_from_npz(d)
    try:
        from keras.datasets import mnist as _keras_mnist

        (x_tr, y_tr), (x_te, y_te) = _keras_mnist.load_data()
        return _mnist_from_npz({"x_train": x_tr, "y_train": y_tr,
                                "x_test": x_te, "y_test": y_te})
    except Exception:
        pass
    _missing("mnist", "mnist.npz")
    rng = np.random.RandomState(42)
    n_tr, n_te = 6000, 1000
    x_tr = rng.random((n_tr, 784)).astype(np.float32)
    x_te = rng.random((n_te, 784)).astype(np.float32)
    y_tr = rng.randint(0, 10, n_tr)
    y_te = rng.randint(0, 10, n_te)
    return x_tr, y_tr, x_te, y_te


def _synthetic_classification(n: int, f: int, seed: int):
    rng = np.random.RandomState(seed)
    x = rng.standard_normal((n, f))
    w = rng.standard_normal(f)
    p = 1.0 / (1.0 + np.exp(-(x @ w) / np.sqrt(f)))
    y = (rng.random(n) < p).astype(np.float64)
    return x, y
