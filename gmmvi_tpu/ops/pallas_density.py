"""Fused density-pack Pallas kernel: the framework's hottest pass.

One training step's dominant cost (measured ~0.9 ms of a ~2.6 ms step on a
v5e at the flagship shape) is the current-model density pass over the sample
window: per-component whitened diffs, Mahalanobis terms, mixture logsumexp,
responsibilities, and the analytic mixture gradient
(:func:`gmmvi_tpu.models.gmm.density_pack`).  The XLA path materializes two
``[K, N, D]`` intermediates in HBM (~150 MB of traffic) and runs 3-4x off the
bandwidth roofline.

This kernel computes component log-densities ``[K, N]``, mixture log-density
``[N]``, and mixture gradients in ONE pass over N-tiles with everything
resident in VMEM.  The key identity: the per-component mean subtraction
folds into a bias,

    L_k^{-1} (x - mu_k) = L_k^{-1} x - L_k^{-1} mu_k,

so ALL components' whitening collapses into a single stacked matmul

    y = W1 @ x - b1        # W1: [K*D, D] stacked L_k^{-1},  x: [D, T]

followed by a squared-rows segment-sum (reshape ``[K, D, T]`` + sublane
reduction) for the Mahalanobis terms.  The gradient pass reuses the same
``x`` tile with the stacked precisions ``W2 = [K*D, D]`` (rows of
Lambda_k = Sigma_k^{-1}) and contracts responsibilities on the VPU:

    grad(x) = - sum_k r_k(x) (W2_k x - b2_k).

Numerical note: the bias fold subtracts two possibly-large numbers, so both
``x`` and the means are globally centered on the active-means centroid
before packing (the same trick the Stein moment form uses) — magnitudes are
then bounded by the mixture's spread, not its distance from the origin.

Layout: N rides the **lane** axis (tiles of 512 lanes), stacked component
rows ride sublanes — the ``[K, N]`` outputs need no transposes, all
reductions are sublane-cheap, and the only replicated HBM input is the
``[D, N]`` transposed sample matrix (vs the 6x-replicated ``[128, N]`` of
the round-1 block-diagonal design).

The Stein estimator consumes this pack through its moment form (no
``[K, N, D]`` ``prec_times_diff`` needed); see
:func:`gmmvi_tpu.optimization.ng_estimators.stein_estimate`.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)
_N_TILE = 512
# VMEM guard: the [K_pad*D, T] whitened intermediate(s) must stay comfortably
# inside ~16 MB of VMEM; 2048 rows * 512 lanes * 4 B = 4 MB per intermediate.
_MAX_KD = 2048
# The streaming kernels keep full-width [8, N_pad] online-logsumexp
# accumulators in VMEM scratch; past this many samples (2 x 64 B/column =
# 4 MB of scratch) the dispatchers chunk the sample axis instead (columns
# are independent) — a fully-preallocated stm20 window (~200k samples)
# measured a 21 MB scoped-VMEM overflow otherwise.
_N_CHUNK = 65536

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_BIG_NEG = -3.0e38

# Matmul mode for the streaming kernels' whitening dots: "f32" runs the MXU's
# multi-pass f32 emulation (Precision.HIGHEST — measured ~36 TFLOP/s ceiling
# on a v5e, ~6 bf16 passes); "bf16x3" splits each operand into bf16 hi + lo
# halves OUTSIDE the kernel (same HBM/VMEM bytes: 2 x bf16 = 1 x f32) and
# takes 3 native bf16 dots with f32 accumulation inside — the standard
# 3-pass f32 emulation (XLA's Precision.HIGH, which Mosaic does not lower),
# ~2x the matmul throughput at ~1e-6 relative error on the whitened values
# (the global centering in _pack keeps operand magnitudes bounded by the
# mixture spread, so the dropped lo*lo term stays ~2^-16 relative).
MATMUL_MODE = "bf16x3"


def _split_bf16(a):
    """f32 -> (hi, lo) bf16 pair with a + 0 == hi + lo to ~2^-16 relative."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(whi, wlo, xhi, xlo):
    """3-pass f32-emulated matmul from pre-split bf16 operands."""
    dn = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(whi, xhi, dn,
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(whi, xlo, dn,
                                    preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(wlo, xhi, dn,
                                    preferred_element_type=jnp.float32)
    return acc


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def supports(num_dimensions: int, k_pad: int) -> bool:
    """Whether the fused kernels can handle this (D, K_pad) combination."""
    return (
        _HAVE_PALLAS
        and num_dimensions <= 128
        and _round_up(k_pad, 8) * num_dimensions <= _MAX_KD
    )


def _logsumexp_rows(comp, logw, out_rows):
    """Masked mixture logsumexp over the sublane (K) axis -> ([rows, T], resp)."""
    weighted = jnp.maximum(comp + logw, _BIG_NEG)
    mx = jnp.max(weighted, axis=0, keepdims=True)            # [1, T]
    expw = jnp.where(weighted > 0.5 * _BIG_NEG, jnp.exp(weighted - mx), 0.0)
    ssum = jnp.sum(expw, axis=0, keepdims=True)              # [1, T]
    model = jnp.log(jnp.maximum(ssum, 1e-38)) + mx           # [1, T]
    return jnp.broadcast_to(model, (out_rows, model.shape[1])), expw / ssum


def _density_pack_kernel(w1_ref, b1_ref, w2_ref, b2_ref, logdet_ref,
                         logw_ref, x_ref, comp_ref, model_ref, grads_ref,
                         *, d, k_pad):
    """One grid step = one N-tile."""
    t = x_ref.shape[1]
    x = x_ref[...]                                           # [d_pad, T]

    # ---- pass 1: component log-densities (one stacked matmul) ---------
    y = jax.lax.dot_general(
        w1_ref[...], x, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) - b1_ref[...]                                          # [K_pad*d, T]
    maha = jnp.sum((y * y).reshape(k_pad, d, t), axis=1)     # [K_pad, T]
    comp = -0.5 * maha - logdet_ref[...] - 0.5 * d * LOG_2PI
    comp_ref[...] = comp

    # ---- mixture logsumexp + responsibilities (sublane reduction) -----
    model, resp = _logsumexp_rows(comp, logw_ref[...], model_ref.shape[0])
    model_ref[...] = model

    # ---- pass 2: gradient accumulation --------------------------------
    ptd = jax.lax.dot_general(
        w2_ref[...], x, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) - b2_ref[...]                                          # [K_pad*d, T]
    contrib = ptd.reshape(k_pad, d, t) * resp[:, None, :]
    grads = -jnp.sum(contrib, axis=0)                        # [d, T]
    pad_rows = grads_ref.shape[0] - d
    if pad_rows:
        grads = jnp.concatenate(
            [grads, jnp.zeros((pad_rows, t), jnp.float32)], axis=0)
    grads_ref[...] = grads


def _densities_kernel(w1_ref, b1_ref, logdet_ref, logw_ref, x_ref,
                      comp_ref, model_ref, *, d, k_pad):
    """Pass-1-only variant: component log-densities + mixture logsumexp
    (for consumers that need no gradients, e.g. the weight updater's
    post-update log-ratio pass)."""
    t = x_ref.shape[1]
    y = jax.lax.dot_general(
        w1_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) - b1_ref[...]
    maha = jnp.sum((y * y).reshape(k_pad, d, t), axis=1)
    comp = -0.5 * maha - logdet_ref[...] - 0.5 * d * LOG_2PI
    comp_ref[...] = comp
    model, _ = _logsumexp_rows(comp, logw_ref[...], model_ref.shape[0])
    model_ref[...] = model


def _pick_n_tile(kd: int, passes: int) -> int:
    """Largest N tile keeping the kernel's VMEM residency under ~12 MB:
    each matmul pass holds a [kd, T] f32 intermediate (plus the reshaped
    per-component view).  kd=1984 with T=512 measured a 16.01 MB scoped-VMEM
    overflow on v5e (breast-cancer shape, K_pad=64, D=31)."""
    budget = 12 * 1024 * 1024
    t = _N_TILE
    # passes matmul intermediates + the reshaped per-component view + the
    # responsibility-weighted contribution tile (measured: kd=1984, T=512
    # lands at ~16 MB, i.e. ~4 tile-sized buffers live at once)
    while t > 128 and (passes + 2) * kd * t * 4 > budget:
        t //= 2
    return t


@functools.partial(jax.jit, static_argnames=("d", "k_pad", "interpret"))
def _fused_densities_call(w1, b1, logdets, logws, x, d, k_pad,
                          interpret=False):
    kd, d_pad = w1.shape
    n_pad = x.shape[1]
    t = _pick_n_tile(kd, passes=1)
    n_tiles = n_pad // t
    kernel = functools.partial(_densities_kernel, d=d, k_pad=k_pad)
    comp, model = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((kd, d_pad), lambda i: (0, 0)),
            pl.BlockSpec((kd, 1), lambda i: (0, 0)),
            pl.BlockSpec((k_pad, 1), lambda i: (0, 0)),
            pl.BlockSpec((k_pad, 1), lambda i: (0, 0)),
            pl.BlockSpec((d_pad, t), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((k_pad, t), lambda i: (0, i)),
            pl.BlockSpec((8, t), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(w1, b1, logdets, logws, x)
    return comp, model


@functools.partial(jax.jit, static_argnames=("d", "k_pad", "interpret"))
def _fused_density_call(w1, b1, w2, b2, logdets, logws, x, d, k_pad,
                        interpret=False):
    kd, d_pad = w1.shape
    n_pad = x.shape[1]
    t = _pick_n_tile(kd, passes=2)
    n_tiles = n_pad // t
    kernel = functools.partial(_density_pack_kernel, d=d, k_pad=k_pad)
    comp, model, grads = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((kd, d_pad), lambda i: (0, 0)),
            pl.BlockSpec((kd, 1), lambda i: (0, 0)),
            pl.BlockSpec((kd, d_pad), lambda i: (0, 0)),
            pl.BlockSpec((kd, 1), lambda i: (0, 0)),
            pl.BlockSpec((k_pad, 1), lambda i: (0, 0)),
            pl.BlockSpec((k_pad, 1), lambda i: (0, 0)),
            pl.BlockSpec((d_pad, t), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((k_pad, t), lambda i: (0, i)),
            pl.BlockSpec((8, t), lambda i: (0, i)),
            pl.BlockSpec((_round_up(d, 8), t), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((_round_up(d, 8), n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(w1, b1, w2, b2, logdets, logws, x)
    return comp, model, grads


def _background_kernel(*refs, d, u_tile, t, mm):
    """One grid step = one (U-tile, N-tile) pair; U is the OUTER grid axis.

    Streams the count-weighted mixture logsumexp over U-tiles with flash-
    attention-style online accumulators (running max ``m`` and rescaled sum
    ``s`` in full-width ``[8, N_pad]`` VMEM scratch, sliced per N-tile), so
    the ``[U, N]`` logit matrix and the ``[U, N, D]`` whitening chain never
    touch HBM.  U-outer ordering keeps each ``[u_tile*D, D]`` whitening
    block resident across the whole N sweep — with N outer (the previous
    layout) the full stacked-W matrix restreamed once per N-tile, ~5.6 GB
    of HBM traffic per pass at the stm300 background shape (U_pad=160,
    W=12000, D=300) vs ~58 MB now."""
    if mm == "bf16x3":
        (w1hi_ref, w1lo_ref, b1_ref, logdet_ref, logw_ref, xhi_ref,
         xlo_ref, out_ref, m_ref, s_ref) = refs
    else:
        (w1_ref, b1_ref, logdet_ref, logw_ref, x_ref,
         out_ref, m_ref, s_ref) = refs
    j = pl.program_id(0)
    i = pl.program_id(1)
    last = pl.num_programs(0) - 1
    col = pl.ds(i * t, t)

    if mm == "bf16x3":
        y = _dot3(w1hi_ref[...], w1lo_ref[...],
                  xhi_ref[...], xlo_ref[...]) - b1_ref[...]
    else:
        y = jax.lax.dot_general(
            w1_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) - b1_ref[...]                                      # [u_tile*d, T]
    maha = jnp.sum((y * y).reshape(u_tile, d, t), axis=1)    # [u_tile, T]
    c = -0.5 * maha - logdet_ref[...] - 0.5 * d * LOG_2PI + logw_ref[...]
    c = jnp.maximum(c, _BIG_NEG)

    tile_max = jnp.broadcast_to(jnp.max(c, axis=0, keepdims=True),
                                (8, t))

    @pl.when(j == 0)
    def _():
        m_ref[:, col] = jnp.full((8, t), _BIG_NEG, jnp.float32)
        s_ref[:, col] = jnp.zeros((8, t), jnp.float32)

    prev_m = m_ref[:, col]
    prev_s = s_ref[:, col]
    new_m = jnp.maximum(prev_m, tile_max)
    # masked rows carry c = _BIG_NEG: exp(c - new_m) underflows to 0 for any
    # finite new_m; the all-masked case keeps new_m = _BIG_NEG and the final
    # log(s) + m stays ~_BIG_NEG (an effective -inf)
    expc = jnp.exp(c - new_m[:1, :])
    ssum = jnp.sum(expc, axis=0, keepdims=True)              # [1, T]
    new_s = prev_s * jnp.exp(prev_m - new_m) + jnp.broadcast_to(
        ssum, (8, t))
    m_ref[:, col] = new_m
    s_ref[:, col] = new_s

    @pl.when(j == last)
    def _():
        out_ref[...] = jnp.where(
            new_s > 0.0,
            jnp.log(jnp.maximum(new_s, 1e-38)) + new_m,
            jnp.full((8, t), _BIG_NEG, jnp.float32),
        )


@functools.partial(jax.jit,
                   static_argnames=("d", "u_tile", "t", "mm", "interpret"))
def _background_call(w1, b1, logdets, logws, x, d, u_tile, t=_N_TILE,
                     mm="f32", interpret=False):
    ud, d_pad = w1.shape
    n_pad = x.shape[1]
    n_tiles = n_pad // t
    u_tiles = ud // (u_tile * d)
    kernel = functools.partial(_background_kernel, d=d, u_tile=u_tile, t=t,
                               mm=mm)
    w_spec = pl.BlockSpec((u_tile * d, d_pad), lambda j, i: (j, 0))
    x_spec = pl.BlockSpec((d_pad, t), lambda j, i: (0, i))
    if mm == "bf16x3":
        w1hi, w1lo = _split_bf16(w1)
        xhi, xlo = _split_bf16(x)
        ins = (w1hi, w1lo, b1, logdets, logws, xhi, xlo)
        in_specs = [w_spec, w_spec]
        x_specs = [x_spec, x_spec]
    else:
        ins = (w1, b1, logdets, logws, x)
        in_specs = [w_spec]
        x_specs = [x_spec]
    (bg,) = pl.pallas_call(
        kernel,
        grid=(u_tiles, n_tiles),  # U outer: W blocks stay resident
        in_specs=in_specs + [
            pl.BlockSpec((u_tile * d, 1), lambda j, i: (j, 0)),
            pl.BlockSpec((u_tile, 1), lambda j, i: (j, 0)),
            pl.BlockSpec((u_tile, 1), lambda j, i: (j, 0)),
        ] + x_specs,
        out_specs=[
            pl.BlockSpec((8, t), lambda j, i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, n_pad), jnp.float32),
            pltpu.VMEM((8, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*ins)
    return bg


def supports_background(num_dimensions: int) -> bool:
    """The streaming kernel tiles U, so only D is constrained.  Above
    D=128, (u_tile, n_tile) come from the large-D VMEM budget; above
    D~360 (u_tile=4) the pass routes through the K-tiled density stream
    whose rank-3 vector layout has no 8-sublane minimum, matching the
    density kernels' D<=512 envelope."""
    if not _HAVE_PALLAS or num_dimensions < 1:
        return False
    if num_dimensions <= 128:
        return True
    from gmmvi_tpu.ops import pallas_density_large as _pdl

    return _pdl._pick_tiles(num_dimensions) is not None


def fused_background_logpdf(means, inv_chols, log_weights, log_dets, samples,
                            interpret=False):
    """Streaming count-weighted background mixture log-density ``[N]``:

        bg(x) = logsumexp_u(log N(x; mu_u, Sigma_u) + log_weights[u])

    over an arbitrary number of generating distributions ``U`` (tiled; no
    ``K_pad * D`` VMEM bound like the density pack).  Rows with
    ``log_weights = -inf`` are masked out; the all-masked result is a large
    negative float (effective -inf).  Replaces the XLA chain at
    sample_db._dist_log_pdfs + masked_logsumexp, which materializes
    ``[U, N, D]`` intermediates (~440 MB of HBM traffic at the flagship
    shape; reference computes the same quantity sample-wise at
    sample_db.py:164-192)."""
    u, d = means.shape
    n = samples.shape[0]
    if not _HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    if not supports_background(d):
        raise ValueError("fused background kernel: D out of envelope")
    if n > _N_CHUNK:
        return jnp.concatenate([
            fused_background_logpdf(means, inv_chols, log_weights, log_dets,
                                    samples[i:i + _N_CHUNK],
                                    interpret=interpret)
            for i in range(0, n, _N_CHUNK)
        ])
    if d <= 128:
        # budget both the [u_tile*d, T] whitened intermediate and the
        # [u_tile, T] logit tile (at small D the latter dominates;
        # u_tile=1024 at D=2 measured an 18 MB scoped-VMEM overflow on v5e)
        u_tile = max(8, min(_MAX_KD // d, 512) // 8 * 8)
        t = _N_TILE
    else:
        from gmmvi_tpu.ops import pallas_density_large as _pdl

        u_tile, t = _pdl._pick_tiles(d)
        if u_tile < 8:
            # D > ~360: this kernel's rank-2 [u_tile, 1] per-dist vector
            # blocks need >= 8 sublanes; the K-tiled density stream uses a
            # rank-3 [tiles, 8, 1] layout instead — its mixture-logsumexp
            # output IS the count-weighted background (the per-dist density
            # block it also writes is a few MB of HBM, negligible vs the
            # whitening matmuls at this D).
            _, model = _pdl.fused_component_densities_large(
                means, inv_chols, log_weights, log_dets, samples,
                interpret=interpret)
            return model
    u_pad = _round_up(u, u_tile)
    w1, b1, _, _, logdet_p, logw_p, x, _ = _pack(
        means, inv_chols, log_weights, log_dets, samples, rows_pad=u_pad,
        need_w2=False, n_tile=t)
    bg = _background_call(w1, b1, logdet_p, logw_p, x, d=d, u_tile=u_tile,
                          t=t, mm=MATMUL_MODE, interpret=interpret)
    return bg[0, :n]


def _pack(means, inv_chols, log_weights, log_dets, samples, rows_pad: int,
          need_w2: bool, n_tile: int = _N_TILE):
    """Shared packing for every fused kernel: stacked whitening factors +
    folded-mean biases, centered transposed samples.  ``rows_pad`` is the
    padded component-row count (K rounded to 8 for the density pack, U
    rounded to the streaming tile for the background kernel); all outputs
    are tiny except the [D, N] sample matrix (a single pad + transpose).
    ``n_tile`` is the N-tile the consumer kernel iterates over (the large-D
    kernels shrink it to fit VMEM)."""
    k, d = means.shape
    n = samples.shape[0]
    if not _HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    kd = rows_pad * d
    d_pad = _round_up(d, 8)
    n_pad = _round_up(n, n_tile)
    f32 = jnp.float32

    # global centering: bound the bias-fold magnitudes by the mixture spread
    active = log_weights > 0.5 * _BIG_NEG
    n_act = jnp.maximum(jnp.sum(active), 1)
    shift = jnp.sum(jnp.where(active[:, None], means, 0.0), 0) / n_act

    inv_p = jnp.zeros((rows_pad, d, d), f32).at[:k].set(inv_chols)
    mu_p = jnp.zeros((rows_pad, d), f32).at[:k].set(means - shift[None, :])

    w1 = jnp.zeros((kd, d_pad), f32).at[:, :d].set(inv_p.reshape(kd, d))
    b1 = jnp.einsum("kij,kj->ki", inv_p, mu_p,
                    precision=jax.lax.Precision.HIGHEST).reshape(kd, 1)
    if need_w2:
        lam = jnp.einsum("kji,kjl->kil", inv_p, inv_p,
                         precision=jax.lax.Precision.HIGHEST)
        w2 = jnp.zeros((kd, d_pad), f32).at[:, :d].set(lam.reshape(kd, d))
        b2 = jnp.einsum("kij,kj->ki", lam, mu_p,
                        precision=jax.lax.Precision.HIGHEST).reshape(kd, 1)
    else:
        w2 = b2 = None

    logdet_p = jnp.zeros((rows_pad, 1), f32).at[:k, 0].set(log_dets)
    logw_p = jnp.full((rows_pad, 1), _BIG_NEG, f32).at[:k, 0].set(
        jnp.maximum(log_weights, _BIG_NEG))

    # keep the transpose a standalone op: fusing it with the centering
    # subtraction + pad makes XLA emit a ~10x slower gather loop
    # (measured 1.0 ms vs 0.09 ms on a v5e)
    x_pad = jnp.pad(samples.astype(f32) - shift[None, :].astype(f32),
                    ((0, n_pad - n), (0, 0)))
    xT = jax.lax.transpose(x_pad, (1, 0))                    # [d, n_pad]
    x = jnp.pad(xT, ((0, d_pad - d), (0, 0)))
    return w1, b1, w2, b2, logdet_p, logw_p, x, rows_pad


def _prepare(means, inv_chols, log_weights, log_dets, samples,
             need_w2: bool):
    """Density-pack packing: rows padded to a multiple of 8, K_pad * D
    bounded by the VMEM-resident kernel design."""
    k, d = means.shape
    k_pad = _round_up(k, 8)
    if k_pad * d > _MAX_KD or d > 128:
        raise ValueError(
            f"fused density kernels support K_pad*D <= {_MAX_KD}, D <= 128")
    return _pack(means, inv_chols, log_weights, log_dets, samples,
                 rows_pad=k_pad, need_w2=need_w2)


def fused_density_pack(means, inv_chols, log_weights, log_dets, samples,
                       interpret=False):
    """Fused (component log-densities [K, N], mixture log-density [N],
    mixture grads [N, D]) on TPU.

    Args:
        means: ``[K, D]``; inv_chols: ``[K, D, D]`` lower-triangular inverse
        Cholesky factors; log_weights: ``[K]`` with -inf for masked slots;
        log_dets: ``[K]`` = sum log diag chol; samples: ``[N, D]``.
    """
    k, d = means.shape
    n = samples.shape[0]
    w1, b1, w2, b2, logdet_p, logw_p, x, k_pad = _prepare(
        means, inv_chols, log_weights, log_dets, samples, need_w2=True)
    comp, model, grads = _fused_density_call(
        w1, b1, w2, b2, logdet_p, logw_p, x, d=d, k_pad=k_pad,
        interpret=interpret,
    )
    return comp[:k, :n], model[0, :n], grads[:d, :n].T


def fused_component_densities(means, inv_chols, log_weights, log_dets,
                              samples, interpret=False):
    """Fused (component log-densities [K, N], mixture log-density [N]) —
    the gradient-free variant (skips the second matmul pass)."""
    k, d = means.shape
    n = samples.shape[0]
    w1, b1, _, _, logdet_p, logw_p, x, k_pad = _prepare(
        means, inv_chols, log_weights, log_dets, samples, need_w2=False)
    comp, model = _fused_densities_call(
        w1, b1, logdet_p, logw_p, x, d=d, k_pad=k_pad, interpret=interpret
    )
    return comp[:k, :n], model[0, :n]
