"""Checkpoint / resume of the full training state.

The reference only dumps model parameters write-only (gmmvi_runner.py:177-200,
no restore path exists).  Here the complete :class:`TrainState` pytree —
model, meta-state, sample database, stepsize state, adaptation counters, RNG
key — round-trips through one ``.npz`` file, so training actually resumes.

Leaves are keyed by their **pytree path** (e.g. ``model.means``) rather than
position, and the file carries a format version plus a structure fingerprint
(path names, shapes, dtypes): loading into a state with different paths or
shapes fails loudly with the offending paths; dtype-only differences (hash
mismatch with matching paths/shapes, e.g. an x64-mode change) warn and
coerce.
"""
from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

FORMAT_VERSION = 2


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts) or "<root>"


def _named_leaves(state: Any):
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    named = {}
    for path, leaf in leaves:
        name = _path_str(path)
        if name in named:
            raise ValueError(f"duplicate pytree path {name!r}")
        named[name] = leaf
    return named


def structure_hash(state: Any) -> str:
    """Fingerprint of the state's structure: leaf paths, shapes, dtypes."""
    named = _named_leaves(state)
    desc = ";".join(
        f"{k}:{tuple(np.shape(v))}:{np.asarray(v).dtype}"
        for k, v in sorted(named.items())
    )
    return hashlib.sha256(desc.encode()).hexdigest()[:16]


def save_state(path: str, state: Any) -> None:
    """Save any pytree of arrays to ``path`` (.npz), leaves keyed by path."""
    named = _named_leaves(state)
    arrays = {f"leaf::{k}": np.asarray(v) for k, v in named.items()}
    np.savez(
        path,
        __format_version__=np.asarray(FORMAT_VERSION),
        __structure_hash__=np.asarray(structure_hash(state)),
        **arrays,
    )


def load_state(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_state`; ``like`` supplies the
    structure (e.g. a freshly built TrainState with identical config).

    Structural mismatches (missing/extra leaves, shape or dtype changes)
    raise with the offending paths named."""
    data = np.load(path, allow_pickle=False)
    if "__format_version__" not in data:
        raise ValueError(
            f"{path} is not a gmmvi_tpu checkpoint (no format version); "
            "files written before format v2 are positional and unsupported."
        )
    version = int(data["__format_version__"])
    if version > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format v{version} is newer than supported "
            f"v{FORMAT_VERSION}"
        )

    stored = {
        k[len("leaf::"):]: data[k] for k in data.files if k.startswith("leaf::")
    }
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(like)
    expected = {_path_str(p): leaf for p, leaf in leaves_with_path}

    missing = sorted(set(expected) - set(stored))
    extra = sorted(set(stored) - set(expected))
    if missing or extra:
        raise ValueError(
            "checkpoint structure mismatch — "
            + (f"missing in file: {missing[:5]}; " if missing else "")
            + (f"not in target state: {extra[:5]}; " if extra else "")
            + "was the config (capacities, selector sizes, module types) "
            "changed since saving?"
        )
    bad_shapes = [
        k for k in expected
        if tuple(np.shape(expected[k])) != tuple(stored[k].shape)
    ]
    if bad_shapes:
        detail = ", ".join(
            f"{k}: file {stored[k].shape} vs state "
            f"{tuple(np.shape(expected[k]))}" for k in bad_shapes[:5]
        )
        raise ValueError(
            f"checkpoint leaf shapes differ ({detail}) — rebuild with the "
            "same static capacities (tpu.max_components, window sizes) or "
            "repad before loading."
        )

    # paths and shapes match here; a structure-hash mismatch can then only
    # be a dtype difference (e.g. x64 mode changed) — coerced below, but
    # surfaced so it never passes silently
    if "__structure_hash__" in data \
            and str(data["__structure_hash__"]) != structure_hash(like):
        import warnings

        bad_dtypes = [
            k for k in expected
            if np.asarray(expected[k]).dtype != stored[k].dtype
        ]
        warnings.warn(
            "checkpoint leaf dtypes differ from the target state "
            f"({bad_dtypes[:5]}); coercing to the target dtypes")

    new_leaves = []
    for p, ref in leaves_with_path:
        arr = stored[_path_str(p)]
        if hasattr(ref, "dtype"):
            arr = jnp.asarray(arr, dtype=ref.dtype)
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
