"""Fused streaming Stein second-moment kernel (the large-D estimator hot op).

The self-normalized Stein estimator's moment form needs, per component,

    s_mom[k] = sum_n w[k, n] * g[n, :] (x[n, :] - c)^T        ([K, D, D])

(reference: the per-component expectation loop of
src/gmmvi/optimization/gmmvi_modules/ng_estimator.py:171-188).  The XLA
einsum ``kn,nd,ne->kde`` decomposes pairwise and materializes the weighted
``[K, N, D]`` gradient array in HBM — ~577 MB at the SAMTRON stm300 shape
(K_pad=40, N=12032, D=300), round-tripped once per step, on top of a 6-pass
``Precision.HIGHEST`` contraction.

This kernel streams over N-tiles instead: grid ``(k_tiles, n_tiles)`` with
the N axis inner/sequential, ``ktile`` components per K-tile.  Each grid
step loads one ``[D, T]`` transposed-gradient tile and one ``[T, D]``
sample tile, scales the gradient rows by each component's weight row (VPU),
and accumulates ``(w_c * G^T) @ X`` into a ``[ktile*D, D]`` VMEM scratch on
the MXU — only the final ``[K, D, D]`` moments reach HBM.  Matmuls follow
:data:`gmmvi_tpu.ops.pallas_density.MATMUL_MODE`: under ``bf16x3`` the
weighted gradient tile is hi/lo-split *in kernel* (it only exists there)
while the sample tiles are pre-split outside like the density kernels'.

Gated to D > 64: below that the XLA intermediate is small and the stock
einsum is already latency-class work (the flagship-shape graph is
unchanged).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gmmvi_tpu.ops import pallas_density as _pd

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_N_TILE = 512
_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _vmem_cost(d_pad: int, ktile: int, t: int) -> int:
    acc = ktile * d_pad * d_pad * 4
    out = 2 * ktile * d_pad * d_pad * 4       # double-buffered output block
    tiles = 2 * (d_pad * t * 4) + 2 * (t * d_pad * 4) + 2 * 8 * t * 4
    return acc + out + tiles


def _pick_ktile(d: int) -> int:
    d_pad = _round_up(d, 8)
    for ktile in (8, 4, 2, 1):
        if _vmem_cost(d_pad, ktile, _N_TILE) <= _VMEM_BUDGET:
            return ktile
    return 0


def supports(d: int, n: int) -> bool:
    """D > 64 only: the win is the [K, N, D] HBM intermediate + 6-pass
    matmuls, both of which only matter at large D (keeps small-D graphs,
    incl. the flagship shape, bit-unchanged)."""
    return _HAVE_PALLAS and 64 < d <= 512 and n >= 512 and _pick_ktile(d) > 0


def _smom_kernel(*refs, ktile, d_pad, mm):
    """Grid step (j, i) = (K-tile, N-tile); N inner so the [ktile*D, D]
    accumulator stays resident across the sample sweep."""
    if mm == "bf16x3":
        (w_ref, g_ref, xhi_ref, xlo_ref, out_ref, acc_ref) = refs
    else:
        (w_ref, g_ref, x_ref, out_ref, acc_ref) = refs
    i = pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    dn = (((1,), (0,)), ((), ()))
    g = g_ref[...]                                        # [d_pad, T] f32
    for c in range(ktile):
        a = g * w_ref[0, c:c + 1, :]                      # [d_pad, T]
        if mm == "bf16x3":
            ahi = a.astype(jnp.bfloat16)
            alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                ahi, xhi_ref[...], dn, preferred_element_type=jnp.float32)
            part = part + jax.lax.dot_general(
                ahi, xlo_ref[...], dn, preferred_element_type=jnp.float32)
            part = part + jax.lax.dot_general(
                alo, xhi_ref[...], dn, preferred_element_type=jnp.float32)
        else:
            part = jax.lax.dot_general(
                a, x_ref[...], dn,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        acc_ref[c * d_pad:(c + 1) * d_pad, :] += part

    @pl.when(i == last)
    def _():
        out_ref[0] = acc_ref[...]


@functools.partial(jax.jit,
                   static_argnames=("ktile", "d_pad", "mm", "interpret"))
def _smom_call(w3, gt, x, ktile, d_pad, mm="f32", interpret=False):
    k_tiles = w3.shape[0]
    n_pad = gt.shape[1]
    n_tiles = n_pad // _N_TILE
    kernel = functools.partial(_smom_kernel, ktile=ktile, d_pad=d_pad, mm=mm)
    g_spec = pl.BlockSpec((d_pad, _N_TILE), lambda j, i: (0, i))
    x_spec = pl.BlockSpec((_N_TILE, d_pad), lambda j, i: (i, 0))
    if mm == "bf16x3":
        xhi, xlo = _pd._split_bf16(x)
        ins = (w3, gt, xhi, xlo)
        x_specs = [x_spec, x_spec]
    else:
        ins = (w3, gt, x)
        x_specs = [x_spec]
    (out,) = pl.pallas_call(
        kernel,
        grid=(k_tiles, n_tiles),  # N inner: accumulator resident per K-tile
        in_specs=[
            pl.BlockSpec((1, 8, _N_TILE), lambda j, i: (j, 0, i)),
            g_spec,
        ] + x_specs,
        out_specs=[
            pl.BlockSpec((1, ktile * d_pad, d_pad), lambda j, i: (j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_tiles, ktile * d_pad, d_pad),
                                 jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ktile * d_pad, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*ins)
    return out


def fused_stein_smom(weights, grads, centered_samples, interpret=False,
                     mm=None):
    """``s_mom[k] = sum_n weights[k, n] * grads[n, :] centered[n, :]^T``.

    Args:
        weights: ``[K, N]`` per-component normalized importance weights
            (padded/invalid samples must carry weight 0).
        grads: ``[N, D]`` log-ratio gradients.
        centered_samples: ``[N, D]`` samples minus the centering shift.

    Returns:
        ``[K, D, D]`` second moments, matching the XLA einsum
        ``kn,nd,ne->kde`` to float rounding (``mm='f32'``) or ~1e-6
        relative (default ``bf16x3``).
    """
    if mm is None:
        mm = _pd.MATMUL_MODE
    k, n = weights.shape
    d = grads.shape[1]
    ktile = _pick_ktile(d)
    if ktile == 0:
        raise RuntimeError("shape outside kernel envelope")
    d_pad = _round_up(d, 8)
    k_pad = _round_up(k, ktile)
    k_tiles = k_pad // ktile
    n_pad = _round_up(n, _N_TILE)
    f32 = jnp.float32

    w3 = jnp.zeros((k_tiles, 8, n_pad), f32)
    w3 = w3.at[:, :ktile, :n].set(
        jnp.pad(weights.astype(f32), ((0, k_pad - k), (0, 0)))
        .reshape(k_tiles, ktile, n))
    gt = jnp.pad(
        jax.lax.transpose(grads.astype(f32), (1, 0)),
        ((0, d_pad - d), (0, n_pad - n)))
    x = jnp.pad(centered_samples.astype(f32),
                ((0, n_pad - n), (0, d_pad - d)))

    out = _smom_call(w3, gt, x, ktile=ktile, d_pad=d_pad, mm=mm,
                     interpret=interpret)
    return out.reshape(k_tiles * ktile, d_pad, d_pad)[:k, :d, :d]
