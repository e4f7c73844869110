"""Checkpoint / resume of the full training state.

The reference only dumps model parameters write-only (gmmvi_runner.py:177-200,
no restore path exists).  Here the complete :class:`TrainState` pytree —
model, meta-state, sample database, stepsize state, adaptation counters, RNG
key — round-trips through one ``.npz`` file, so training actually resumes.
"""
from __future__ import annotations

import io
import json
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def _leaf_key(i: int) -> str:
    return f"leaf_{i:04d}"


def save_state(path: str, state: Any) -> None:
    """Save any pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {_leaf_key(i): np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path, __num_leaves__=np.asarray(len(leaves)), **arrays)


def load_state(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_state`; ``like`` supplies the
    structure (e.g. a freshly built TrainState with identical config)."""
    data = np.load(path)
    n = int(data["__num_leaves__"])
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves but the provided structure has "
            f"{len(leaves)} — config mismatch?"
        )
    new_leaves = []
    for i, ref in enumerate(leaves):
        arr = data[_leaf_key(i)]
        if hasattr(ref, "dtype"):
            arr = jnp.asarray(arr, dtype=ref.dtype)
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
