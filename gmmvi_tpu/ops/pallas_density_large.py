"""K-tiled streaming density kernels for large D (the stm300 regime).

The VMEM-resident density pack (:mod:`gmmvi_tpu.ops.pallas_density`) needs
all ``K_pad * D`` stacked whitening rows live at once, which caps it at
``D <= 128`` (and ``K_pad * D <= 2048``).  At D=300 the XLA path
materializes ``[K, N, D]`` intermediates in HBM (~200 MB per pass at the
SAMTRON stm300 shape) and the density/estimator phases are bandwidth-bound.

These kernels stream over BOTH axes: grid ``(N-tiles, K-tiles)`` with the
K axis inner/sequential, ``ktile`` components per K-tile (8 up to D~320,
4 beyond — the double-buffered ``[ktile*D, D]`` whitening block dominates
VMEM).  Per grid step, one stacked matmul whitens the tile
(``y = W1 x - b1``), the Mahalanobis reduction produces the per-tile
component-density block (written straight out), and the mixture logsumexp
accumulates flash-attention-style (running max + rescaled sum in VMEM
scratch, the pattern of :func:`pallas_density._background_kernel`).  The
gradient pass is a second streamed kernel that re-whitens with the
precision rows and accumulates ``-sum_k r_k (Lambda_k x - b2_k)`` into a
``[D, T]`` scratch — no ``[K, N, D]`` array ever touches HBM.

Per-component vectors (log-dets, log-weights) and the component-density
output ride rank-3 ``[k_tiles, 8, ...]`` layouts (tiles padded to 8
sublanes) so every block satisfies the (8, 128) f32 tiling constraint even
when ``ktile < 8``.

Numerics: identical bias-fold + global-centering scheme as the small-D
kernels (see :func:`pallas_density._pack`); values match the XLA path to
float rounding.

(reference: the [K, N, D] hot chain of
src/gmmvi/models/full_cov_gmm.py:56-62 at D=300.)
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from gmmvi_tpu.ops import pallas_density as _pd

LOG_2PI = math.log(2.0 * math.pi)
_BIG_NEG = _pd._BIG_NEG
_VMEM_BUDGET = 13 * 1024 * 1024

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _vmem_cost(d: int, ktile: int, t: int) -> int:
    dp = _round_up(d, 8)
    fixed = 2 * ktile * d * dp * 4          # double-buffered W block (+bias)
    per_t = 3 * ktile * d * 4 + 3 * dp * 4  # y / contrib tiles + x + grads
    return fixed + t * per_t


_TILE_OVERRIDE = None  # (ktile, t) — experimentation hook for benchmarks


def _pick_tiles(d: int):
    """(ktile, t): components per K-tile and the N-tile length.

    Prefers the candidate with the fewest grid steps per unit work
    (largest ktile * t product that fits VMEM), tie-broken toward wider
    N-tiles: grid-step overhead is the dominant loss at large D (RESULTS_r04
    rooflines), and a wide tile amortizes it over more MXU work."""
    if _TILE_OVERRIDE is not None:
        return _TILE_OVERRIDE
    best = None
    for ktile in (8, 4):
        if (ktile * d) % 8:
            continue
        t = 512
        while t > 128 and _vmem_cost(d, ktile, t) > _VMEM_BUDGET:
            t //= 2
        if _vmem_cost(d, ktile, t) <= _VMEM_BUDGET:
            cand = (ktile, t)
            if best is None or (cand[0] * cand[1], cand[1]) > (
                    best[0] * best[1], best[1]):
                best = cand
    return best


def supports(num_dimensions: int) -> bool:
    """Also serves small D when K_pad * D exceeds the VMEM-resident
    kernel's cap (large-K runs) — the K-tiled stream has no K bound."""
    return (_HAVE_PALLAS and 1 <= num_dimensions <= 512
            and _pick_tiles(num_dimensions) is not None)


def _density_kernel(*refs, d, ktile, t, mm):
    """Grid step (j, i) = (K-tile, N-tile); K OUTER so each [ktile*D, D]
    whitening block stays resident across the whole N sweep (K inner would
    restream the full stacked-W matrix once per N-tile — ~1.4 GB/pass at
    the stm300 shape; measured end-to-end neutral there, the pass is
    MXU-compute-bound, but residency scales better with window size).  The
    mixture-logsumexp accumulators live in full-width [8, N_pad] scratch,
    sliced per N-tile."""
    if mm == "bf16x3":
        (w1hi_ref, w1lo_ref, b1_ref, logdet_ref, logw_ref, xhi_ref,
         xlo_ref, comp_ref, model_ref, m_ref, s_ref) = refs
    else:
        (w1_ref, b1_ref, logdet_ref, logw_ref, x_ref,
         comp_ref, model_ref, m_ref, s_ref) = refs
    j = pl.program_id(0)
    i = pl.program_id(1)
    last = pl.num_programs(0) - 1
    col = pl.ds(i * t, t)

    if mm == "bf16x3":
        y = _pd._dot3(w1hi_ref[...], w1lo_ref[...],
                      xhi_ref[...], xlo_ref[...]) - b1_ref[...]
    else:
        y = jax.lax.dot_general(
            w1_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) - b1_ref[...]                                  # [ktile*d, T]
    maha = jnp.sum((y * y).reshape(ktile, d, t), axis=1)
    comp = -0.5 * maha - logdet_ref[0, :ktile] - 0.5 * d * LOG_2PI
    if ktile < 8:
        comp = jnp.concatenate(
            [comp, jnp.zeros((8 - ktile, t), jnp.float32)], axis=0)
    comp_ref[0] = comp                                   # [8, T] padded

    logw = logw_ref[0]                                   # [8, 1], pad -inf
    c = jnp.maximum(comp + logw, _BIG_NEG)               # [8, T]
    tile_max = jnp.broadcast_to(jnp.max(c, axis=0, keepdims=True), (8, t))

    @pl.when(j == 0)
    def _():
        m_ref[:, col] = jnp.full((8, t), _BIG_NEG, jnp.float32)
        s_ref[:, col] = jnp.zeros((8, t), jnp.float32)

    prev_m = m_ref[:, col]
    prev_s = s_ref[:, col]
    new_m = jnp.maximum(prev_m, tile_max)
    expc = jnp.where(c > 0.5 * _BIG_NEG, jnp.exp(c - new_m[:1, :]), 0.0)
    ssum = jnp.sum(expc, axis=0, keepdims=True)
    new_s = prev_s * jnp.exp(prev_m - new_m) + jnp.broadcast_to(
        ssum, (8, t))
    m_ref[:, col] = new_m
    s_ref[:, col] = new_s

    @pl.when(j == last)
    def _():
        model_ref[...] = jnp.where(
            new_s > 0.0,
            jnp.log(jnp.maximum(new_s, 1e-38)) + new_m,
            jnp.full((8, t), _BIG_NEG, jnp.float32),
        )


def _grad_kernel(*refs, d, ktile, mm):
    """Second streamed pass: grads(x) = -sum_k r_k (Lambda_k x - b2_k)."""
    if mm == "bf16x3":
        (w2hi_ref, w2lo_ref, b2_ref, logw_ref, comp_ref, model_ref,
         xhi_ref, xlo_ref, grads_ref, acc_ref) = refs
        t = xhi_ref.shape[1]
    else:
        (w2_ref, b2_ref, logw_ref, comp_ref, model_ref, x_ref,
         grads_ref, acc_ref) = refs
        t = x_ref.shape[1]
    j = pl.program_id(1)
    last = pl.num_programs(1) - 1

    if mm == "bf16x3":
        ptd = _pd._dot3(w2hi_ref[...], w2lo_ref[...],
                        xhi_ref[...], xlo_ref[...]) - b2_ref[...]
    else:
        ptd = jax.lax.dot_general(
            w2_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) - b2_ref[...]                                  # [ktile*d, T]
    logw = logw_ref[0, :ktile]                           # [ktile, 1]
    lr = comp_ref[0, :ktile] + logw - model_ref[0:1, :]  # [ktile, T]
    resp = jnp.where(logw > 0.5 * _BIG_NEG, jnp.exp(lr), 0.0)
    contrib = jnp.sum(ptd.reshape(ktile, d, t) * resp[:, None, :], axis=0)
    pad_rows = acc_ref.shape[0] - d
    if pad_rows:
        contrib = jnp.concatenate(
            [contrib, jnp.zeros((pad_rows, t), jnp.float32)], axis=0)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    acc_ref[...] += contrib

    @pl.when(j == last)
    def _():
        grads_ref[...] = -acc_ref[...]


@functools.partial(jax.jit,
                   static_argnames=("d", "ktile", "t", "mm", "interpret"))
def _densities_call(w1, b1, logdets, logws, x, d, ktile, t, mm="f32",
                    interpret=False):
    kd, d_pad = w1.shape
    n_pad = x.shape[1]
    n_tiles = n_pad // t
    k_tiles = kd // (ktile * d)
    kernel = functools.partial(_density_kernel, d=d, ktile=ktile, t=t, mm=mm)
    w_spec = pl.BlockSpec((ktile * d, d_pad), lambda j, i: (j, 0))
    x_spec = pl.BlockSpec((d_pad, t), lambda j, i: (0, i))
    if mm == "bf16x3":
        w1hi, w1lo = _pd._split_bf16(w1)
        xhi, xlo = _pd._split_bf16(x)
        ins = (w1hi, w1lo, b1, logdets, logws, xhi, xlo)
        in_specs = [w_spec, w_spec]
        x_specs = [x_spec, x_spec]
    else:
        ins = (w1, b1, logdets, logws, x)
        in_specs = [w_spec]
        x_specs = [x_spec]
    comp, model = pl.pallas_call(
        kernel,
        grid=(k_tiles, n_tiles),  # K outer: W blocks stay resident
        in_specs=in_specs + [
            pl.BlockSpec((ktile * d, 1), lambda j, i: (j, 0)),
            pl.BlockSpec((1, 8, 1), lambda j, i: (j, 0, 0)),
            pl.BlockSpec((1, 8, 1), lambda j, i: (j, 0, 0)),
        ] + x_specs,
        out_specs=[
            pl.BlockSpec((1, 8, t), lambda j, i: (j, 0, i)),
            pl.BlockSpec((8, t), lambda j, i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_tiles, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, n_pad), jnp.float32),
            pltpu.VMEM((8, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*ins)
    return comp, model


@functools.partial(jax.jit,
                   static_argnames=("d", "ktile", "t", "mm", "interpret"))
def _grads_call(w2, b2, logws, comp, model, x, d, ktile, t, mm="f32",
                interpret=False):
    kd, d_pad = w2.shape
    n_pad = x.shape[1]
    n_tiles = n_pad // t
    k_tiles = kd // (ktile * d)
    kernel = functools.partial(_grad_kernel, d=d, ktile=ktile, mm=mm)
    w_spec = pl.BlockSpec((ktile * d, d_pad), lambda i, j: (j, 0))
    x_spec = pl.BlockSpec((d_pad, t), lambda i, j: (0, i))
    if mm == "bf16x3":
        w2hi, w2lo = _pd._split_bf16(w2)
        xhi, xlo = _pd._split_bf16(x)
        ins = (w2hi, w2lo, b2, logws, comp, model, xhi, xlo)
        in_specs = [w_spec, w_spec]
        x_specs = [x_spec, x_spec]
    else:
        ins = (w2, b2, logws, comp, model, x)
        in_specs = [w_spec]
        x_specs = [x_spec]
    (grads,) = pl.pallas_call(
        kernel,
        grid=(n_tiles, k_tiles),
        in_specs=in_specs + [
            pl.BlockSpec((ktile * d, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 8, 1), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 8, t), lambda i, j: (j, 0, i)),
            pl.BlockSpec((8, t), lambda i, j: (0, i)),
        ] + x_specs,
        out_specs=[
            pl.BlockSpec((d_pad, t), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d_pad, t), jnp.float32),
        ],
        interpret=interpret,
    )(*ins)
    return grads


def _prepare(means, inv_chols, log_weights, log_dets, samples, need_w2):
    k, d = means.shape
    ktile, t = _pick_tiles(d)
    k_pad = _round_up(k, ktile)
    k_tiles = k_pad // ktile
    w1, b1, w2, b2, logdet_p, logw_p, x, _ = _pd._pack(
        means, inv_chols, log_weights, log_dets, samples,
        rows_pad=k_pad, need_w2=need_w2, n_tile=t)
    # rank-3 padded per-component vectors: [k_tiles, 8, 1]
    def tiles3(v, fill):
        out = jnp.full((k_tiles, 8, 1), fill, jnp.float32)
        return out.at[:, :ktile, :].set(v.reshape(k_tiles, ktile, 1))

    logdet3 = tiles3(logdet_p, 0.0)
    logw3 = tiles3(logw_p, _BIG_NEG)
    return (w1, b1, w2, b2, logdet3, logw3, x, ktile, t, k_pad, k_tiles)


def _unpad_comp(comp3, ktile, k, n):
    """[k_tiles, 8, n_pad] -> [k, n] (drop sublane padding per tile)."""
    return comp3[:, :ktile, :].reshape(-1, comp3.shape[2])[:k, :n]


def fused_component_densities_large(means, inv_chols, log_weights, log_dets,
                                    samples, interpret=False):
    """(component log-densities [K, N], mixture log-density [N]),
    streamed over K-tiles; supports D up to 512 with no K bound."""
    k, d = means.shape
    n = samples.shape[0]
    if n > _pd._N_CHUNK:
        parts = [
            fused_component_densities_large(
                means, inv_chols, log_weights, log_dets,
                samples[i:i + _pd._N_CHUNK], interpret=interpret)
            for i in range(0, n, _pd._N_CHUNK)
        ]
        return (jnp.concatenate([p[0] for p in parts], axis=1),
                jnp.concatenate([p[1] for p in parts]))
    (w1, b1, _, _, logdet3, logw3, x, ktile, t, _, _) = _prepare(
        means, inv_chols, log_weights, log_dets, samples, need_w2=False)
    comp3, model = _densities_call(w1, b1, logdet3, logw3, x, d=d,
                                   ktile=ktile, t=t, mm=_pd.MATMUL_MODE,
                                   interpret=interpret)
    return _unpad_comp(comp3, ktile, k, n), model[0, :n]


def fused_density_pack_large(means, inv_chols, log_weights, log_dets,
                             samples, interpret=False):
    """(component log-densities [K, N], mixture log-density [N], mixture
    grads [N, D]); two streamed passes sharing the packed inputs."""
    k, d = means.shape
    n = samples.shape[0]
    if n > _pd._N_CHUNK:
        parts = [
            fused_density_pack_large(
                means, inv_chols, log_weights, log_dets,
                samples[i:i + _pd._N_CHUNK], interpret=interpret)
            for i in range(0, n, _pd._N_CHUNK)
        ]
        return (jnp.concatenate([p[0] for p in parts], axis=1),
                jnp.concatenate([p[1] for p in parts]),
                jnp.concatenate([p[2] for p in parts], axis=0))
    (w1, b1, w2, b2, logdet3, logw3, x, ktile, t, _, _) = _prepare(
        means, inv_chols, log_weights, log_dets, samples, need_w2=True)
    comp3, model = _densities_call(w1, b1, logdet3, logw3, x, d=d,
                                   ktile=ktile, t=t, mm=_pd.MATMUL_MODE,
                                   interpret=interpret)
    grads = _grads_call(w2, b2, logw3, comp3, model, x, d=d, ktile=ktile,
                        t=t, mm=_pd.MATMUL_MODE, interpret=interpret)
    return (_unpad_comp(comp3, ktile, k, n), model[0, :n],
            grads[:d, :n].T)
