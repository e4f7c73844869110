"""Device-sharded sample database: per-device ring shards (opt-in).

The default :class:`~gmmvi_tpu.optimization.sample_db.SampleDbState` keeps
one global sample ring; under a data-parallel mesh the per-step ring write
is a scatter of the (sharded) batch into a replicated array, which the SPMD
partitioner resolves by all-gathering the batch — the only batch-sized
collective left in the sharded step (~2 x 768 KB at the flagship shape,
RESULTS_r02).  This module eliminates it: every device keeps its OWN ring
shard and writes only its local slice of the batch, so the per-step DB
traffic drops to the [R_dist * Kmax]-sized count all-reduce of the
background weighting (a few KB).

Enabled with ``tpu: {db_layout: sharded}`` (requires a mesh with a ``data``
axis).

Semantics vs the reference (deliberate, documented in PARITY_MAP.md):

* The reuse window becomes "each device's newest ``n/P`` valid samples"
  instead of "the globally newest ``n``" — the window's *multiset* matches
  the global ring whenever per-device valid counts are balanced (they are,
  up to the per-component ``max(1, n_des - n_eff)`` variation, because the
  proposal rows block-shard by component slot), and function-evaluation
  accounting stays EXACT (validity is decided before any DB write).
* The add-heuristic reservoir is likewise sharded; candidates draw
  uniformly per device shard.

Everything is expressed as batched ops over the leading device axis
``[P, ...]`` pinned to the mesh's ``data`` axis with sharding constraints —
the XLA partitioner then keeps every ring operation local to its device (no
shard_map needed; verified by scripts/analyze_collectives.py --sharded-db).

(reference: src/gmmvi/optimization/sample_db.py — same public contract as
the ring-mode :mod:`gmmvi_tpu.optimization.sample_db`.)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from gmmvi_tpu.models.gmm import GmmState
from gmmvi_tpu.ops.stable import masked_logsumexp, NEG_INF
from gmmvi_tpu.optimization import sample_db as db_ops
from gmmvi_tpu.optimization.sample_db import SampleWindow


@struct.dataclass
class ShardedSampleDbState:
    """Per-device ring shards; leading axis ``P`` rides the mesh's data axis.

    The distribution-snapshot ring stays replicated (tiny, written once per
    iteration from the replicated model)."""

    # per-device sample rings [P, S_l, ...]
    samples: jnp.ndarray
    target_lnpdfs: jnp.ndarray
    target_grads: jnp.ndarray
    sample_iter: jnp.ndarray
    sample_comp: jnp.ndarray
    write_pos: jnp.ndarray            # [P]
    num_samples_written: jnp.ndarray  # scalar, global feval counter

    # replicated distribution ring (as in SampleDbState)
    dist_means: jnp.ndarray
    dist_chols: jnp.ndarray
    dist_inv_chols: jnp.ndarray
    dist_block_iter: jnp.ndarray

    # per-device reservoir shards [P, C_l, ...]
    res_samples: jnp.ndarray
    res_lnpdfs: jnp.ndarray
    res_count: jnp.ndarray            # [P]

    diagonal: bool = struct.field(pytree_node=False, default=False)
    keep_samples: bool = struct.field(pytree_node=False, default=True)

    @property
    def n_shards(self) -> int:
        return self.samples.shape[0]

    @property
    def capacity_local(self) -> int:
        return self.samples.shape[1]

    @property
    def num_dimensions(self) -> int:
        return self.samples.shape[2]

    @property
    def ring_iters(self) -> int:
        return self.dist_means.shape[0]

    @property
    def max_components(self) -> int:
        return self.dist_means.shape[1]

    @property
    def reservoir_capacity_local(self) -> int:
        return self.res_samples.shape[1]


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def create_sharded_db(
    dim: int,
    max_components: int,
    capacity: int,
    dist_ring_iters: int,
    reservoir_capacity: int,
    n_shards: int,
    diagonal: bool = False,
    keep_samples: bool = True,
    dtype=jnp.float32,
) -> ShardedSampleDbState:
    """``capacity`` is the global reuse-window size; EVERY device ring gets
    that full capacity.  Per-device write rates are unbalanced (proposal
    rows block-shard by component slot, and fresh counts vary per component
    as ``max(1, n_des - n_eff)``), so a ``capacity/P`` shard would evict
    reusable samples during write bursts.  Per-device memory equals what the
    replicated plain ring already used per device — the sharding trades
    logical capacity (P x) for zero collective traffic, not for memory.

    ``reservoir_capacity`` is global; reservoir shards get the
    ceil-division (uniform-over-history holds per shard)."""
    p = n_shards
    s_l = capacity
    c_l = max(1, _ceil_div(reservoir_capacity, p))
    r, kmax = dist_ring_iters, max_components
    if diagonal:
        chol_shape = (r, kmax, dim)
        dist_chols = jnp.ones(chol_shape, dtype)
    else:
        dist_chols = jnp.tile(jnp.eye(dim, dtype=dtype)[None, None],
                              (r, kmax, 1, 1))
    return ShardedSampleDbState(
        samples=jnp.zeros((p, s_l, dim), dtype),
        target_lnpdfs=jnp.zeros((p, s_l), dtype),
        target_grads=jnp.zeros((p, s_l, dim), dtype),
        sample_iter=jnp.full((p, s_l), -1, jnp.int32),
        sample_comp=jnp.zeros((p, s_l), jnp.int32),
        write_pos=jnp.zeros((p,), jnp.int32),
        num_samples_written=jnp.asarray(0, jnp.int32),
        dist_means=jnp.zeros((r, kmax, dim), dtype),
        dist_chols=dist_chols,
        dist_inv_chols=dist_chols,
        dist_block_iter=jnp.full((r,), -1, jnp.int32),
        res_samples=jnp.zeros((p, c_l, dim), dtype),
        res_lnpdfs=jnp.full((p, c_l), NEG_INF, dtype),
        res_count=jnp.zeros((p,), jnp.int32),
        diagonal=diagonal,
        keep_samples=keep_samples,
    )


def _shard_rows(x, p, shard_fn):
    """[B, ...] -> [P, B/P, ...]; block reshape matches the batch's block
    sharding over the data axis, so the op is layout-only."""
    out = x.reshape((p, x.shape[0] // p) + x.shape[1:])
    return shard_fn(out) if shard_fn is not None else out


def _db_mesh(db):
    """The scoped SPMD mesh when its data axis matches the DB's shard count
    (ring writes/gathers then run under shard_map so every device touches
    only its own shard — a data-dependent scatter/gather along a sharded
    axis is otherwise resolved by the SPMD partitioner with a full
    all-gather of the batch)."""
    from gmmvi_tpu.models import gmm as gmm_module

    if not gmm_module.SPMD_ACTIVE or gmm_module.SPMD_MESH is None:
        return None
    mesh = gmm_module.SPMD_MESH
    if "data" not in mesh.axis_names:
        return None
    if int(mesh.shape["data"]) != db.n_shards:
        return None
    return mesh


def _ring_write_one(ring_s, ring_l, ring_g, ring_it, ring_c, wp,
                    res_s, res_l, res_c,
                    smp, lnp, grd, cmp_, val, rand_slots, accept_u,
                    iteration):
    """One shard's ring + reservoir write (no device axis, scalar ``wp``):
    the same dense circular ops as the global ring (sample_db.py) — row
    scatters lower to sequential per-row loops on TPU, so the valid rows are
    compacted with log-shift passes, spliced with rotate + one dynamic
    update, and the reservoir's random-replacement scatter is a last-wins
    one-hot matmul (bit-identical to scatter-in-order semantics)."""
    b_l = val.shape[0]
    s_l = ring_s.shape[0]
    c_l = res_s.shape[0]
    validf = val.astype(jnp.int32)
    n_valid = jnp.sum(validf)

    iters_b = jnp.full((b_l,), iteration, jnp.int32)
    cmp_b, lnp_b, grd_b, it_b, smp_b = db_ops._compact_valid_rows(
        (cmp_, lnp, grd, iters_b, smp), val)

    def splice(ring, head):
        return db_ops._ring_splice(ring, head, wp, n_valid)

    ring_s = splice(ring_s, smp_b)
    ring_l = splice(ring_l, lnp_b)
    ring_g = splice(ring_g, grd_b)
    ring_it = splice(ring_it, it_b)
    ring_c = splice(ring_c, cmp_b)

    item_no = res_c + jnp.cumsum(validf)
    fill_slots = jnp.clip(item_no - 1, 0, c_l - 1)
    slots = jnp.where(item_no <= c_l, fill_slots, rand_slots)
    accept_p = jnp.minimum(
        1.0, c_l / jnp.maximum(item_no.astype(jnp.float32), 1.0))
    accept = jnp.logical_and(val, accept_u < accept_p)
    slot_of = jnp.where(accept, slots, -1)
    hits = slot_of[None, :] == jnp.arange(c_l)[:, None]       # [C_l, B_l]
    found = jnp.any(hits, axis=1)
    last = jnp.argmax(
        jnp.where(hits, jnp.arange(b_l)[None, :], -1), axis=1)
    onehot = (jnp.arange(b_l)[None, :] == last[:, None]) & found[:, None]
    onehot_f = onehot.astype(jnp.float32)
    new_rows = jnp.einsum("cb,bd->cd", onehot_f, smp,
                          precision=jax.lax.Precision.HIGHEST)
    new_lnp = jnp.einsum("cb,b->c", onehot_f, lnp,
                         precision=jax.lax.Precision.HIGHEST)
    res_s = jnp.where(found[:, None], new_rows.astype(res_s.dtype), res_s)
    res_l = jnp.where(found, new_lnp.astype(res_l.dtype), res_l)

    return (ring_s, ring_l, ring_g, ring_it, ring_c, wp + n_valid,
            res_s, res_l, res_c + n_valid)


def _ring_write_body(ring_s, ring_l, ring_g, ring_it, ring_c, wp,
                     res_s, res_l, res_c,
                     smp, lnp, grd, cmp_, val, rand_slots, accept_u,
                     iteration):
    """Per-device ring + reservoir write; every array carries a leading
    device axis (full ``P`` when called directly, 1 per shard under
    shard_map — the same code serves both).  The per-shard dim-1 case
    squeezes so the dense circular ops see static starts; the direct path
    vmaps (test/fallback only — production runs under shard_map)."""
    args = (ring_s, ring_l, ring_g, ring_it, ring_c, wp,
            res_s, res_l, res_c, smp, lnp, grd, cmp_, val,
            rand_slots, accept_u)
    if val.shape[0] == 1:
        out = _ring_write_one(*[a[0] for a in args], iteration)
        return tuple(o[None] for o in out)
    return jax.vmap(_ring_write_one, in_axes=(0,) * 16 + (None,))(
        *args, iteration)


def add_samples(
    db: ShardedSampleDbState,
    iteration: jnp.ndarray,
    model: GmmState,
    samples: jnp.ndarray,        # [B, D] flat (data-sharded on axis 0)
    valid: jnp.ndarray,          # [B]
    mapping: jnp.ndarray,        # [B]
    target_lnpdfs: jnp.ndarray,  # [B]
    target_grads: jnp.ndarray,   # [B, D]
    key: jnp.ndarray,
    shard_fn=None,
) -> ShardedSampleDbState:
    """Per-device ring writes: each device compacts ITS slice of the batch
    into its own ring shard — no cross-device movement of the batch
    (the write runs under shard_map when a matching mesh is scoped).
    Global feval accounting identical to the unsharded ring
    (reference: sample_db.py:81-135)."""
    p = db.n_shards
    b = samples.shape[0]
    if b % p:
        raise ValueError(
            f"sharded DB needs the batch ({b}) divisible by n_shards ({p})")
    b_l = b // p
    c_l = db.reservoir_capacity_local

    smp = _shard_rows(samples, p, shard_fn)
    lnp = _shard_rows(target_lnpdfs, p, shard_fn)
    grd = _shard_rows(target_grads, p, shard_fn)
    cmp_ = _shard_rows(mapping.astype(jnp.int32), p, shard_fn)
    val = _shard_rows(valid, p, shard_fn)
    slot_key, acc_key = jax.random.split(key)
    rand_slots = jax.random.randint(slot_key, (p, b_l), 0, c_l)
    accept_u = jax.random.uniform(acc_key, (p, b_l))
    if shard_fn is not None:
        rand_slots, accept_u = shard_fn(rand_slots), shard_fn(accept_u)

    body = _ring_write_body
    mesh = _db_mesh(db)
    if mesh is not None:
        from jax import shard_map

        P = jax.sharding.PartitionSpec
        body = shard_map(
            _ring_write_body, mesh=mesh,
            in_specs=tuple([P("data")] * 16) + (P(),),
            out_specs=P("data"), check_vma=False,
        )
    (ring_s, ring_l, ring_g, ring_it, ring_c, wp, res_s, res_l, res_c) = body(
        db.samples, db.target_lnpdfs, db.target_grads, db.sample_iter,
        db.sample_comp, db.write_pos, db.res_samples, db.res_lnpdfs,
        db.res_count, smp, lnp, grd, cmp_, val, rand_slots, accept_u,
        jnp.asarray(iteration, jnp.int32),
    )
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # replicated distribution-ring snapshot (identical to the plain ring)
    row = iteration % db.ring_iters
    return db.replace(
        samples=ring_s, target_lnpdfs=ring_l, target_grads=ring_g,
        sample_iter=ring_it, sample_comp=ring_c, write_pos=wp,
        num_samples_written=db.num_samples_written + n_valid,
        res_samples=res_s, res_lnpdfs=res_l, res_count=res_c,
        dist_means=db.dist_means.at[row].set(model.means),
        dist_chols=db.dist_chols.at[row].set(model.chols),
        dist_inv_chols=db.dist_inv_chols.at[row].set(model.inv_chols),
        dist_block_iter=db.dist_block_iter.at[row].set(iteration),
    )


def _gather_window_sharded(db: ShardedSampleDbState, window: int,
                           n_requested: jnp.ndarray):
    """Per-device newest-window gather with an iteration-granular reuse
    bound.

    The plain ring bounds validity to the globally newest ``n_requested``
    samples by write position (sample_db._gather_window).  A position bound
    cannot be evaluated shard-locally (per-device write rates differ), so
    here the bound is applied at ITERATION granularity: whole recent
    iterations are included newest-first while their cumulative global valid
    count fits ``n_requested``.  In steady state ``n_requested`` is exactly
    the valid count of the previous window plus the newest add batch, so the
    included set matches the plain ring's set exactly; when the budget cuts
    inside an iteration the plain ring keeps a partial batch and this keeps
    the whole one (documented deviation).  The only cross-device traffic is
    the ``[R]`` per-age count histogram.

    The flat outputs are ``[P * w_l, ...]`` with device p's rows in block p
    (data-sharded)."""
    p, s_l = db.n_shards, db.capacity_local
    kmax, r = db.max_components, db.ring_iters
    w_l = _ceil_div(window, p)

    def gather_one(ring_s, ring_l, ring_g, ring_it, ring_c, wp):
        # dense circular window read (one doubled-ring dynamic slice per
        # array — a mod-indexed row gather is a sequential per-row loop on
        # TPU, see sample_db._ring_range)
        pos = wp - w_l + jnp.arange(w_l)
        in_rng = jnp.logical_and(pos >= 0, pos >= wp - s_l)
        start = wp - w_l
        return (db_ops._ring_range(ring_s, start, w_l),
                db_ops._ring_range(ring_l, start, w_l),
                db_ops._ring_range(ring_g, start, w_l),
                db_ops._ring_range(ring_it, start, w_l),
                db_ops._ring_range(ring_c, start, w_l),
                in_rng)

    def gather_idx(ring_s, ring_l, ring_g, ring_it, ring_c, wp):
        # indexed fallback for w_l > s_l (window wider than the shard ring)
        pl = wp.shape[0]
        pos = wp[:, None] - w_l + jnp.arange(w_l)[None, :]   # [pl, w_l]
        in_rng = jnp.logical_and(pos >= 0, pos >= (wp - s_l)[:, None])
        idx = pos % s_l
        dev = jnp.arange(pl)[:, None]
        return (ring_s[dev, idx], ring_l[dev, idx], ring_g[dev, idx],
                ring_it[dev, idx], ring_c[dev, idx], in_rng)

    def gather_body(ring_s, ring_l, ring_g, ring_it, ring_c, wp):
        if w_l > s_l:
            return gather_idx(ring_s, ring_l, ring_g, ring_it, ring_c, wp)
        args = (ring_s, ring_l, ring_g, ring_it, ring_c, wp)
        if wp.shape[0] == 1:  # per-shard under shard_map: static squeeze
            out = gather_one(*[a[0] for a in args])
            return tuple(o[None] for o in out)
        return jax.vmap(gather_one)(*args)

    body = gather_body
    mesh = _db_mesh(db)
    if mesh is not None:
        from jax import shard_map

        P = jax.sharding.PartitionSpec
        body = shard_map(gather_body, mesh=mesh,
                         in_specs=P("data"), out_specs=P("data"),
                         check_vma=False)
    smp, lnp, grd, it2, cmp_, in_range = body(
        db.samples, db.target_lnpdfs, db.target_grads, db.sample_iter,
        db.sample_comp, db.write_pos)

    def flat(x):
        return x.reshape((p * w_l,) + x.shape[2:])

    samples = flat(smp)
    lnpdfs = flat(lnp)
    grads = flat(grd)
    comp = flat(cmp_)
    it = flat(it2)
    in_range = flat(in_range)

    row = it % r
    fresh = jnp.logical_and(it >= 0, db.dist_block_iter[row] == it)
    valid0 = jnp.logical_and(in_range, fresh)

    # iteration-granular count bound (freshness already limits age < R)
    t_max = jnp.max(jnp.where(valid0, it, -1))
    age = t_max - it                                     # >= 0 where valid0
    hist = jnp.zeros((r,), jnp.int32).at[
        jnp.where(valid0, jnp.clip(age, 0, r - 1), r)
    ].add(1, mode="drop")
    cum = jnp.cumsum(hist)
    allowed = cum <= jnp.asarray(n_requested, jnp.int32)
    allowed = allowed.at[0].set(True)  # never cut inside the newest batch
    max_age = jnp.sum(allowed.astype(jnp.int32)) - 1
    valid = jnp.logical_and(valid0, age <= max_age)

    dist_key = row * kmax + comp
    return samples, lnpdfs, grads, comp, valid, dist_key, it


def get_newest_samples(
    db: ShardedSampleDbState,
    window: int,
    n_requested,
    max_background_dists: int,
    shard_fn=None,
) -> SampleWindow:
    """Sharded-ring analogue of :func:`sample_db.get_newest_samples`
    (``n_requested`` is the global requested count, applied at iteration
    granularity — see :func:`_gather_window_sharded`)."""
    kmax, r = db.max_components, db.ring_iters

    samples, lnpdfs, grads, comp, valid, dist_key, sample_iters = \
        _gather_window_sharded(db, window, n_requested)
    if shard_fn is not None:
        samples, lnpdfs, grads, valid = (
            shard_fn(samples), shard_fn(lnpdfs), shard_fn(grads),
            shard_fn(valid),
        )

    counts = jnp.zeros((r * kmax,), jnp.float32).at[
        jnp.where(valid, dist_key, r * kmax)
    ].add(1.0, mode="drop")

    u = min(max_background_dists, r * kmax)
    top_counts, top_keys = jax.lax.top_k(counts, u)
    sel_mask = top_counts > 0
    sel_table = jnp.zeros((r * kmax + 1,), jnp.bool_).at[
        jnp.where(sel_mask, top_keys, r * kmax)
    ].set(True, mode="drop")
    valid = jnp.logical_and(valid, sel_table[jnp.minimum(dist_key, r * kmax)])

    total = jnp.sum(jnp.where(sel_mask, top_counts, 0.0))
    log_weights = jnp.where(
        sel_mask, jnp.log(top_counts) - jnp.log(jnp.maximum(total, 1.0)),
        NEG_INF,
    )

    means_u, inv_u, log_dets_u = db_ops._gather_dists(db, top_keys)
    bg = db_ops._background_logsumexp(db, means_u, inv_u, log_dets_u,
                                      log_weights, sel_mask, samples,
                                      shard_fn=shard_fn)
    return SampleWindow(
        samples=samples,
        mapping=comp,
        target_lnpdfs=lnpdfs,
        target_grads=grads,
        background_log_pdfs=bg,
        valid=valid,
        num_valid=jnp.sum(valid).astype(jnp.int32),
        sample_iters=sample_iters,
    )


def get_newest_samples_fused(
    db: ShardedSampleDbState,
    window: int,
    n_requested: jnp.ndarray,    # global requested count (scalar)
    max_background_dists: int,
    model: GmmState,
    iteration: jnp.ndarray,
    any_old_dists: bool,
    shard_fn=None,
):
    """Sharded-ring analogue of :func:`sample_db.get_newest_samples_fused`
    (shares the current-model density pass with the caller)."""
    from gmmvi_tpu.models.gmm import density_pack

    kmax, r = db.max_components, db.ring_iters

    samples, lnpdfs, grads, comp, valid, dist_key, sample_iters = \
        _gather_window_sharded(db, window, n_requested)
    if shard_fn is not None:
        samples, lnpdfs, grads, valid = (
            shard_fn(samples), shard_fn(lnpdfs), shard_fn(grads),
            shard_fn(valid),
        )

    pack = density_pack(model, samples, shard_fn=shard_fn)
    if shard_fn is not None:
        pack = pack.replace(
            component_log_densities=shard_fn(pack.component_log_densities,
                                             axis=1),
            model_log_densities=shard_fn(pack.model_log_densities),
            model_grads=shard_fn(pack.model_grads),
            prec_times_diff=None if pack.prec_times_diff is None
            else shard_fn(pack.prec_times_diff, axis=1),
        )

    cur_row = iteration % r
    is_cur = dist_key // kmax == cur_row

    counts_cur = jnp.zeros((kmax,), jnp.float32).at[
        jnp.where(valid & is_cur, comp, kmax)
    ].add(1.0, mode="drop")

    if not any_old_dists:
        total = jnp.sum(counts_cur)
        log_w_cur = jnp.where(
            counts_cur > 0,
            jnp.log(jnp.maximum(counts_cur, 1.0))
            - jnp.log(jnp.maximum(total, 1.0)),
            NEG_INF,
        )
        bg = masked_logsumexp(
            pack.component_log_densities + log_w_cur[:, None],
            mask=(counts_cur > 0)[:, None],
            axis=0,
        )
        valid = valid & is_cur
    else:
        counts = jnp.zeros((r * kmax,), jnp.float32).at[
            jnp.where(valid & ~is_cur, dist_key, r * kmax)
        ].add(1.0, mode="drop")
        u = min(max_background_dists, r * kmax)
        top_counts, top_keys = jax.lax.top_k(counts, u)
        sel_mask = top_counts > 0
        sel_table = jnp.zeros((r * kmax + 1,), jnp.bool_).at[
            jnp.where(sel_mask, top_keys, r * kmax)
        ].set(True, mode="drop")
        valid = valid & (is_cur | sel_table[jnp.minimum(dist_key, r * kmax)])

        total = jnp.sum(jnp.where(sel_mask, top_counts, 0.0)) \
            + jnp.sum(counts_cur)
        log_total = jnp.log(jnp.maximum(total, 1.0))
        log_w_cur = jnp.where(
            counts_cur > 0,
            jnp.log(jnp.maximum(counts_cur, 1.0)) - log_total,
            NEG_INF,
        )
        log_w_old = jnp.where(
            sel_mask, jnp.log(top_counts) - log_total, NEG_INF
        )

        means_u, inv_u, log_dets_u = db_ops._gather_dists(db, top_keys)
        # two-size ladder over live old dists (see sample_db for rationale)
        u_small = min(2 * kmax, u)

        def _bg(width):
            def run(_):
                return db_ops._background_logsumexp(
                    db, means_u[:width], inv_u[:width], log_dets_u[:width],
                    log_w_old[:width], sel_mask[:width], samples,
                    shard_fn=shard_fn)
            return run

        if u_small < u:
            n_live = jnp.sum(sel_mask.astype(jnp.int32))
            bg_old = jax.lax.cond(n_live <= u_small, _bg(u_small), _bg(u),
                                  None)
        else:
            bg_old = _bg(u)(None)
        bg_cur = masked_logsumexp(
            pack.component_log_densities + log_w_cur[:, None],
            mask=(counts_cur > 0)[:, None], axis=0,
        )
        bg = jnp.logaddexp(bg_cur, bg_old)

    if shard_fn is not None:
        bg = shard_fn(bg)
    win = SampleWindow(
        samples=samples,
        mapping=comp,
        target_lnpdfs=lnpdfs,
        target_grads=grads,
        background_log_pdfs=bg,
        valid=valid,
        num_valid=jnp.sum(valid).astype(jnp.int32),
        sample_iters=sample_iters,
    )
    return win, pack


def get_random_samples(
    db: ShardedSampleDbState, key: jnp.ndarray, n: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``n`` (sample, lnpdf) pairs: each device shard contributes its share
    (without replacement within a shard), mirroring the plain reservoir's
    uniform-over-history property per shard."""
    p, c_l = db.n_shards, db.reservoir_capacity_local
    d = db.num_dimensions
    if not db.keep_samples:
        s_l = db.capacity_local
        pos = db.write_pos[:, None] - 1 - jnp.arange(s_l)[None, :]
        idx = pos % s_l
        dev = jnp.arange(p)[:, None]
        it = db.sample_iter[dev, idx]
        newest = jnp.max(jnp.where(pos >= 0, it, -1))
        ok = jnp.logical_and(pos >= 0, it == newest)
        rnd = jax.random.uniform(key, (p, s_l))
        order = jnp.argsort(jnp.where(ok, rnd, 2.0), axis=1)
        n_l = _ceil_div(n, p)
        sel = order[:, :n_l]
        smp = db.samples[dev, idx][jnp.arange(p)[:, None], sel]
        lnp = db.target_lnpdfs[dev, idx][jnp.arange(p)[:, None], sel]
        okv = ok[jnp.arange(p)[:, None], sel]
        return (smp.reshape(p * n_l, d)[:n], lnp.reshape(p * n_l)[:n],
                okv.reshape(p * n_l)[:n])

    n_l = _ceil_div(n, p)
    filled = jnp.minimum(db.res_count, c_l)               # [P]
    keys = jax.random.split(key, p)
    perm = jax.vmap(lambda k: jax.random.permutation(k, c_l))(keys)[:, :n_l]
    valid = perm < filled[:, None]
    dev = jnp.arange(p)[:, None]
    smp = db.res_samples[dev, perm].reshape(p * n_l, d)
    lnp = db.res_lnpdfs[dev, perm].reshape(p * n_l)
    return smp[:n], lnp[:n], valid.reshape(p * n_l)[:n]


def repad_db(
    db: ShardedSampleDbState, new_max_components: int, new_capacity: int
) -> ShardedSampleDbState:
    """Grow the component padding and/or the per-device ring capacity
    (host-side, mirrors :func:`sample_db.repad_db` per shard)."""
    p = db.n_shards
    kmax, d = db.max_components, db.num_dimensions
    s_old = db.capacity_local
    s_new = new_capacity  # full window capacity per shard (see create)
    k_extra = new_max_components - kmax

    new = db
    if k_extra > 0:
        r = db.ring_iters
        if db.diagonal:
            pad_chol = jnp.ones((r, k_extra, d), jnp.float32)
        else:
            pad_chol = jnp.tile(
                jnp.eye(d, dtype=jnp.float32)[None, None], (r, k_extra, 1, 1)
            )
        new = new.replace(
            dist_means=jnp.concatenate(
                [db.dist_means, jnp.zeros((r, k_extra, d), jnp.float32)],
                axis=1),
            dist_chols=jnp.concatenate([db.dist_chols, pad_chol], axis=1),
            dist_inv_chols=jnp.concatenate([db.dist_inv_chols, pad_chol],
                                           axis=1),
        )

    if s_new > s_old:
        import numpy as np

        wp = np.asarray(db.write_pos)

        def relay_dev(old_arr_p, wp_p, shape, fill=0):
            n_keep = int(min(wp_p, s_old))
            pos = jnp.arange(n_keep) + (int(wp_p) - n_keep)
            arr = jnp.full(shape, fill, old_arr_p.dtype)
            return arr.at[pos % s_new].set(old_arr_p[pos % s_old])

        def relay(old_arr, shape, fill=0):
            return jnp.stack([
                relay_dev(old_arr[i], wp[i], shape, fill) for i in range(p)
            ])

        new = new.replace(
            samples=relay(db.samples, (s_new, d)),
            target_lnpdfs=relay(db.target_lnpdfs, (s_new,)),
            target_grads=relay(db.target_grads, (s_new, d)),
            sample_iter=relay(db.sample_iter, (s_new,), fill=-1),
            sample_comp=relay(db.sample_comp, (s_new,)),
        )
    return new
