"""Decimation-compatible sample database (parity mode).

The default :mod:`gmmvi_tpu.optimization.sample_db` bounds memory with a
ring + distribution-snapshot ring + reservoir; its reuse-window semantics
match the reference until the reference's database overflows
``max_database_size``.  Past that point the reference *decimates*: it keeps
every 2nd stored sample (oldest-first ``[::2]`` slice) and compacts the
generating-distribution table to the still-referenced entries
(reference: sample_db.py:63-79, triggered at sample_db.py:111-112).

This module reproduces those long-horizon semantics with static shapes:

* samples live in a contiguous prefix ``[0, count)`` of fixed arrays;
* each sample holds an index into a **distribution table** of (mean, chol,
  inv_chol) rows; each ``add_samples`` appends the model's active components
  (the reference appends the full current parameter arrays,
  sample_db.py:115-117);
* when an add would overflow, every 2nd sample survives (``kept = old[::2]``)
  and the table is compacted to used rows in first-appearance order — exactly
  ``tf.unique`` on the surviving mapping;
* the table also self-compacts when *it* fills up (dropping unreferenced
  rows), which the reference only does on decimation.

Enabled with ``tpu: {db_eviction: decimate}``; the default ring mode remains
the TPU-first choice (no data-dependent compaction inside the step).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gmmvi_tpu.models.gmm import GmmState, LOG_2PI
from gmmvi_tpu.ops.stable import masked_logsumexp, NEG_INF
from gmmvi_tpu.optimization.sample_db import SampleWindow

_PREC = jax.lax.Precision.HIGHEST


@struct.dataclass
class DecimatingDbState:
    # contiguous sample store [0, count)
    samples: jnp.ndarray        # [S, D]
    target_lnpdfs: jnp.ndarray  # [S]
    target_grads: jnp.ndarray   # [S, D]
    sample_iter: jnp.ndarray    # [S] int32
    sample_comp: jnp.ndarray    # [S] int32: generating component slot
    dist_idx: jnp.ndarray       # [S] int32: row in the distribution table
    count: jnp.ndarray          # int32: stored samples
    num_samples_written: jnp.ndarray  # int32: feval counter

    # distribution table [0, dist_count)
    dist_means: jnp.ndarray      # [U, D]
    dist_chols: jnp.ndarray      # [U, D, D] or [U, D]
    dist_inv_chols: jnp.ndarray  # same shape
    dist_count: jnp.ndarray      # int32

    diagonal: bool = struct.field(pytree_node=False, default=False)
    keep_samples: bool = struct.field(pytree_node=False, default=True)

    @property
    def capacity(self) -> int:
        return self.samples.shape[0]

    @property
    def num_dimensions(self) -> int:
        return self.samples.shape[1]

    @property
    def dist_capacity(self) -> int:
        return self.dist_means.shape[0]


def create_decimating_db(
    dim: int,
    max_components: int,
    capacity: int,
    dist_capacity: int,
    diagonal: bool = False,
    keep_samples: bool = True,
    dtype=jnp.float32,
) -> DecimatingDbState:
    s, u = capacity, dist_capacity
    chol_shape = (u, dim) if diagonal else (u, dim, dim)

    def eye():  # fresh buffer per field (donation forbids aliased leaves)
        return jnp.ones(chol_shape, dtype) if diagonal else jnp.tile(
            jnp.eye(dim, dtype=dtype)[None], (u, 1, 1))
    return DecimatingDbState(
        samples=jnp.zeros((s, dim), dtype),
        target_lnpdfs=jnp.zeros((s,), dtype),
        target_grads=jnp.zeros((s, dim), dtype),
        sample_iter=jnp.full((s,), -1, jnp.int32),
        sample_comp=jnp.zeros((s,), jnp.int32),
        dist_idx=jnp.zeros((s,), jnp.int32),
        count=jnp.asarray(0, jnp.int32),
        num_samples_written=jnp.asarray(0, jnp.int32),
        dist_means=jnp.zeros((u, dim), dtype),
        dist_chols=eye(),
        dist_inv_chols=eye(),
        dist_count=jnp.asarray(0, jnp.int32),
        diagonal=diagonal,
        keep_samples=keep_samples,
    )


def _compact_dists(db: DecimatingDbState) -> DecimatingDbState:
    """Drop table rows no sample references; renumber in first-appearance
    order (= ascending row order, since blocks append monotonically) —
    matching ``tf.unique`` compaction (reference: sample_db.py:75-79)."""
    u = db.dist_capacity
    in_use_rows = jnp.where(jnp.arange(db.capacity) < db.count,
                            db.dist_idx, u)
    used = jnp.zeros((u + 1,), jnp.int32).at[in_use_rows].set(1)[:u]
    new_pos = jnp.cumsum(used) - 1                      # [U]
    order = jnp.argsort(jnp.logical_not(used.astype(bool)), stable=True)
    return db.replace(
        dist_means=db.dist_means[order],
        dist_chols=db.dist_chols[order],
        dist_inv_chols=db.dist_inv_chols[order],
        dist_idx=jnp.where(
            jnp.arange(db.capacity) < db.count,
            new_pos[jnp.clip(db.dist_idx, 0, u - 1)], 0
        ).astype(jnp.int32),
        dist_count=jnp.sum(used).astype(jnp.int32),
    )


def _decimate(db: DecimatingDbState, room_needed: jnp.ndarray
              ) -> DecimatingDbState:
    """Keep every ``stride``-th sample (oldest of each group survives —
    stride 2 is exactly the reference's ``[::2]`` slice,
    reference: sample_db.py:71-74), then compact the distribution table.

    The stride is the smallest power of two that actually frees
    ``room_needed`` rows: one reference decimation halves, but when a single
    halving cannot make room (tiny ``max_database_size`` relative to the
    per-iteration batch) the reference would simply decimate again on the
    next overflow — applying ``m`` halvings at once (keep every ``2^m``-th)
    is the same surviving set, and it keeps the static-capacity invariant
    ``count <= capacity`` (a single fixed halving silently dropped the
    overflow rows while still counting them)."""
    s = db.capacity
    room = jnp.maximum(s - room_needed, 1)
    need = jnp.maximum((db.count + room - 1) // room, 2)
    stride = jnp.left_shift(
        1, jnp.ceil(jnp.log2(need.astype(jnp.float32))).astype(jnp.int32))
    # float-log2 guard: bump once if ceil rounded down
    stride = jnp.where((db.count + stride - 1) // stride > room,
                       2 * stride, stride).astype(jnp.int32)
    src = jnp.minimum(stride * jnp.arange(s), s - 1)
    new_count = (db.count + stride - 1) // stride
    live = jnp.arange(s) < new_count
    db = db.replace(
        samples=jnp.where(live[:, None], db.samples[src], 0.0),
        target_lnpdfs=jnp.where(live, db.target_lnpdfs[src], 0.0),
        target_grads=jnp.where(live[:, None], db.target_grads[src], 0.0),
        sample_iter=jnp.where(live, db.sample_iter[src], -1),
        sample_comp=jnp.where(live, db.sample_comp[src], 0),
        dist_idx=jnp.where(live, db.dist_idx[src], 0),
        count=new_count.astype(jnp.int32),
    )
    return _compact_dists(db)


def add_samples(
    db: DecimatingDbState,
    iteration: jnp.ndarray,
    model: GmmState,
    samples: jnp.ndarray,
    valid: jnp.ndarray,
    mapping: jnp.ndarray,
    target_lnpdfs: jnp.ndarray,
    target_grads: jnp.ndarray,
    key: jnp.ndarray,
) -> DecimatingDbState:
    """Append the valid rows; decimate first when they would overflow
    (reference: sample_db.py:111-135)."""
    del key
    s, kmax = db.capacity, model.max_components
    b = samples.shape[0]
    validf = valid.astype(jnp.int32)
    n_valid = jnp.sum(validf)

    if not db.keep_samples:
        # use_sample_database=False: each add REPLACES the store, so
        # add-heuristic candidates come from the newest batch only
        # (reference: sample_db.py:126-135 rebuilds the DB per add)
        db = db.replace(count=jnp.asarray(0, jnp.int32),
                        dist_count=jnp.asarray(0, jnp.int32))

    db = jax.lax.cond(
        db.count + n_valid > s,
        lambda d: _decimate(d, n_valid), lambda d: d, db)
    # the table must fit another component block; self-compact when not
    db = jax.lax.cond(
        db.dist_count + model.num_active > db.dist_capacity,
        _compact_dists, lambda d: d, db)

    # append the current active components to the distribution table
    k_rows = jnp.where(jnp.arange(kmax) < model.num_active,
                       db.dist_count + jnp.arange(kmax), db.dist_capacity)
    db = db.replace(
        dist_means=db.dist_means.at[k_rows].set(model.means, mode="drop"),
        dist_chols=db.dist_chols.at[k_rows].set(model.chols, mode="drop"),
        dist_inv_chols=db.dist_inv_chols.at[k_rows].set(
            model.inv_chols, mode="drop"),
    )

    offsets = jnp.cumsum(validf) - 1
    rows = jnp.where(valid, db.count + offsets, s)
    new_db = db.replace(
        samples=db.samples.at[rows].set(samples, mode="drop"),
        target_lnpdfs=db.target_lnpdfs.at[rows].set(target_lnpdfs,
                                                    mode="drop"),
        target_grads=db.target_grads.at[rows].set(target_grads, mode="drop"),
        sample_iter=db.sample_iter.at[rows].set(
            jnp.full((b,), iteration, jnp.int32), mode="drop"),
        sample_comp=db.sample_comp.at[rows].set(
            mapping.astype(jnp.int32), mode="drop"),
        dist_idx=db.dist_idx.at[rows].set(
            (db.dist_count + mapping).astype(jnp.int32), mode="drop"),
        count=(db.count + n_valid).astype(jnp.int32),
        num_samples_written=db.num_samples_written + n_valid,
        dist_count=(db.dist_count + model.num_active).astype(jnp.int32),
    )
    return new_db


def get_newest_samples(
    db: DecimatingDbState,
    window: int,
    n_requested: jnp.ndarray,
    max_background_dists: int,
) -> SampleWindow:
    """Newest-window query with count-weighted background mixture over the
    distinct generating distributions (reference: sample_db.py:194-228).
    After decimation the window reaches into thinned history — these are the
    semantics the ring mode cannot reproduce."""
    s, w = db.capacity, window
    u = db.dist_capacity
    d = db.num_dimensions

    pos = db.count - w + jnp.arange(w)
    valid = jnp.logical_and(pos >= 0, pos >= db.count - n_requested)
    idx = jnp.clip(pos, 0, s - 1)
    samples = db.samples[idx]
    lnpdfs = db.target_lnpdfs[idx]
    grads = db.target_grads[idx]
    dist_key = db.dist_idx[idx]
    comp = db.sample_comp[idx]
    iters = db.sample_iter[idx]

    counts = jnp.zeros((u + 1,), jnp.float32).at[
        jnp.where(valid, dist_key, u)].add(1.0, mode="drop")[:u]
    cap = min(max_background_dists, u)
    top_counts, top_keys = jax.lax.top_k(counts, cap)
    sel_mask = top_counts > 0
    # samples of beyond-cap dists drop from the window (bounded compute)
    sel_table = jnp.zeros((u + 1,), jnp.bool_).at[
        jnp.where(sel_mask, top_keys, u)].set(True, mode="drop")
    valid = jnp.logical_and(valid, sel_table[jnp.minimum(dist_key, u)])
    total = jnp.sum(jnp.where(sel_mask, top_counts, 0.0))
    log_w = jnp.where(
        sel_mask, jnp.log(jnp.maximum(top_counts, 1.0))
        - jnp.log(jnp.maximum(total, 1.0)), NEG_INF)

    means_u = db.dist_means[top_keys]
    inv_u = db.dist_inv_chols[top_keys]
    if db.diagonal:
        log_dets = jnp.sum(jnp.log(db.dist_chols[top_keys]), axis=-1)
        y = (samples[None, :, :] - means_u[:, None, :]) * inv_u[:, None, :]
    else:
        log_dets = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(
            db.dist_chols[top_keys], axis1=-2, axis2=-1))), axis=-1)
        diffs = samples[None, :, :] - means_u[:, None, :]
        y = jnp.einsum("uij,unj->uni", inv_u, diffs, precision=_PREC)
    maha = -0.5 * jnp.sum(jnp.square(y), axis=-1)
    log_pdfs = maha - log_dets[:, None] - 0.5 * d * LOG_2PI
    bg = masked_logsumexp(log_pdfs + log_w[:, None], mask=sel_mask[:, None],
                          axis=0)

    return SampleWindow(
        samples=samples,
        mapping=comp,
        target_lnpdfs=lnpdfs,
        target_grads=grads,
        background_log_pdfs=bg,
        valid=valid,
        num_valid=jnp.sum(valid).astype(jnp.int32),
        sample_iters=iters,
    )


def get_random_samples(db: DecimatingDbState, key: jnp.ndarray, n: int):
    """Uniform without replacement over the stored (decimated) samples
    (reference: sample_db.py:137-152)."""
    s = db.capacity
    ok = jnp.arange(s) < db.count
    r = jax.random.uniform(key, (s,))
    order = jnp.argsort(jnp.where(ok, r, 2.0))
    sel = order[:n]
    return db.samples[sel], db.target_lnpdfs[sel], ok[sel]
