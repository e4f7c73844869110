"""Fused MORE Gram kernel: whiten + quadratic features + weighted Gram.

The MORE estimator fits, per component, a quadratic surrogate by weighted
ridge regression over F = 1 + D + D(D+1)/2 features of the whitened samples
(reference: least_squares.py:126-191).  The XLA path materializes the
``[N, F]`` design matrix in HBM per component (~26 MB at the ZAMTRON stm20
shape, round-tripped K=48 times ≈ 2.5 GB of traffic) and builds the
triangular pair features with gathers.

This kernel computes, for all components in one pallas_call, the weighted
normal equations

    gram_k = X_k^T W_k X_k        rhs_k = X_k^T W_k y

streaming over N-tiles: each grid step whitens one sample tile
(``z = A_k x - b_k``, one matmul), forms the feature tile ``[F, T]`` in VMEM
with an unrolled triangular slice product (no gathers), and accumulates
``gram += (w * feats) @ feats^T`` on the MXU into a VMEM scratch
accumulator.  Only the final ``[F, F]`` Gram and ``[F]`` rhs per component
reach HBM.  The downstream Cholesky solve + unwhitening stay in XLA
(tiny, [F, F] per component).

Feature ordering matches the reference (row-major upper triangle
``z_0*z_{0:}, z_1*z_{1:}, ..., z, 1``, least_squares.py:113-124).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_N_TILE = 512


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def num_features(d: int) -> int:
    return 1 + d + d * (d + 1) // 2


def supports(d: int, n: int) -> bool:
    """VMEM budget: feats + wf tiles are [F_pad, T] each."""
    if not _HAVE_PALLAS or d > 45:
        return False
    f_pad = _round_up(num_features(d), 8)
    # feats + wf + gram accumulator + slack, in f32
    return (2 * f_pad * _N_TILE + f_pad * f_pad) * 4 < 10 * 1024 * 1024


def _more_gram_kernel(a_ref, b_ref, w_ref, y_ref, x_ref,
                      gram_ref, rhs_ref, acc_g, acc_r, *, d, f_pad):
    """Grid = (K, N-tiles); N is the inner (sequential) axis."""
    j = pl.program_id(1)
    last = pl.num_programs(1) - 1
    t = x_ref.shape[1]

    # whiten: z = A x - b   ([d_pad, T]; padded rows are zero by packing)
    z = jax.lax.dot_general(
        a_ref[0], x_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) - b_ref[0]

    # features [F_pad, T]: rows z_i * z_{i:} (row-major triu), then z, 1, pad
    rows = [z[i:i + 1, :] * z[i:d, :] for i in range(d)]
    rows.append(z[:d, :])
    rows.append(jnp.ones((1, t), jnp.float32))
    f = num_features(d)
    if f_pad > f:
        rows.append(jnp.zeros((f_pad - f, t), jnp.float32))
    feats = jnp.concatenate(rows, axis=0)

    w = w_ref[0, 0:1, :]                                  # [1, T]
    wf = feats * w

    @pl.when(j == 0)
    def _():
        acc_g[...] = jnp.zeros(acc_g.shape, jnp.float32)
        acc_r[...] = jnp.zeros(acc_r.shape, jnp.float32)

    acc_g[...] += jax.lax.dot_general(
        wf, feats, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    wy = wf * y_ref[0:1, :]                               # [F_pad, T]
    acc_r[...] += jnp.sum(wy, axis=1, keepdims=True)

    @pl.when(j == last)
    def _():
        gram_ref[0] = acc_g[...]
        rhs_ref[0] = acc_r[...]


@functools.partial(jax.jit, static_argnames=("d", "f_pad", "interpret"))
def _more_gram_call(a, b, w, y, x, d, f_pad, interpret=False):
    k = a.shape[0]
    d_pad = a.shape[1]
    n_pad = x.shape[1]
    n_tiles = n_pad // _N_TILE
    kernel = functools.partial(_more_gram_kernel, d=d, f_pad=f_pad)
    gram, rhs = pl.pallas_call(
        kernel,
        grid=(k, n_tiles),
        in_specs=[
            pl.BlockSpec((1, d_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, d_pad, 1), lambda i, j: (i, 0, 0)),
            # w rides as [K, 8, N] (8 replicated sublanes): a (1, T) block of
            # [K, N] violates the 8-sublane block constraint
            pl.BlockSpec((1, 8, _N_TILE), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, _N_TILE), lambda i, j: (0, j)),
            pl.BlockSpec((d_pad, _N_TILE), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, f_pad, f_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, f_pad, 1), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, f_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, f_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f_pad, f_pad), jnp.float32),
            pltpu.VMEM((f_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(a, b, w, y, x)
    return gram, rhs


def fused_more_grams(inv_chols, means, weights, outputs, samples,
                     interpret=False):
    """All components' weighted normal equations in one streamed pass.

    Args:
        inv_chols: ``[K, D, D]`` whitening factors (lower inverse Cholesky).
        means: ``[K, D]`` whitening centers.
        weights: ``[K, N]`` per-component importance weights (already
            masked; padded samples must carry weight 0).
        outputs: ``[N]`` regression targets (log ratios).
        samples: ``[N, D]``.

    Returns:
        (gram ``[K, F, F]``, rhs ``[K, F]``) over the reference's feature
        ordering, where ``F = 1 + D + D(D+1)/2``.
    """
    k, d = means.shape
    n = samples.shape[0]
    if not _HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    f = num_features(d)
    f_pad = _round_up(f, 8)
    d_pad = _round_up(d, 8)
    n_pad = _round_up(n, _N_TILE)
    f32 = jnp.float32

    a = jnp.zeros((k, d_pad, d_pad), f32).at[:, :d, :d].set(inv_chols)
    bvec = jnp.einsum("kij,kj->ki", inv_chols, means,
                      precision=jax.lax.Precision.HIGHEST)
    b = jnp.zeros((k, d_pad, 1), f32).at[:, :d, 0].set(bvec)
    w = jnp.broadcast_to(
        jnp.pad(weights.astype(f32), ((0, 0), (0, n_pad - n)))[:, None, :],
        (k, 8, n_pad))
    y = jnp.pad(outputs.astype(f32), (0, n_pad - n))[None, :]
    x_pad = jnp.pad(samples.astype(f32), ((0, n_pad - n), (0, 0)))
    x = jnp.pad(jax.lax.transpose(x_pad, (1, 0)), ((0, d_pad - d), (0, 0)))

    gram, rhs = _more_gram_call(a, b, w, y, x, d=d, f_pad=f_pad,
                                interpret=interpret)
    return gram[:, :f, :f], rhs[:, :f, 0]
