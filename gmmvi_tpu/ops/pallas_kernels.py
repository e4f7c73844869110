"""Pallas TPU kernels for the mixture-density hot paths.

The framework's dominant reduction is ``logsumexp_k(log_w_k + log N(x_n;
mu_k, Sigma_k))`` over many Gaussians — the mixture log-density
(reference: gmm.py:203-216) and, with per-snapshot distributions, the sample
database's background density (reference: sample_db.py:164-192, the O(N *
K_db * D^2) hot loop flagged in SURVEY.md §3.1).

XLA's fused path materializes the full ``[K, N]`` logit matrix in HBM.  This
kernel streams over component tiles with a running (max, sum) accumulator —
the flash-attention softmax trick — so only ``[N]`` leaves the chip and the
Mahalanobis matmuls run tile-by-tile out of VMEM on the MXU.

Falls back to the plain XLA implementation off-TPU or for shapes where
streaming cannot pay off; `fused_mixture_logpdf` is shape-agnostic
(component count K, sample count N, dimension D are padded to tile multiples
with -inf log-weights).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

LOG_2PI = math.log(2.0 * math.pi)
NEG_INF = -jnp.inf

# tile sizes: lanes = 128, f32 sublanes = 8
_N_TILE = 512
_K_TILE = 16


def _plain_mixture_logpdf(means, inv_chols, log_weights, log_dets, samples):
    """XLA reference path: materializes [K, N] logits."""
    d = samples.shape[1]
    diffs = samples[None, :, :] - means[:, None, :]
    y = jnp.einsum("kij,knj->kni", inv_chols, diffs,
                   precision=jax.lax.Precision.HIGHEST)
    maha = jnp.sum(jnp.square(y), axis=-1)
    logits = (
        -0.5 * maha - log_dets[:, None] - 0.5 * d * LOG_2PI
        + log_weights[:, None]
    )
    mx = jnp.max(logits, axis=0)
    mx_safe = jnp.where(jnp.isfinite(mx), mx, 0.0)
    s = jnp.sum(jnp.exp(logits - mx_safe[None, :]), axis=0)
    return jnp.where(s > 0, jnp.log(s) + mx_safe, NEG_INF)


def _mixture_logpdf_kernel(means_ref, invchol_ref, logw_ref, logdet_ref,
                           samples_ref, out_ref, *, k_tiles, d, d_pad):
    """One grid step handles an N-tile; loops over K-tiles with a streaming
    logsumexp accumulator held in registers/VMEM."""
    x = samples_ref[...]  # [N_TILE, D_pad]
    n_tile = x.shape[0]

    def k_step(kt, carry):
        run_max, run_sum = carry
        mu = means_ref[pl.ds(kt * _K_TILE, _K_TILE), :]          # [Kt, D_pad]
        logw = logw_ref[pl.ds(kt * _K_TILE, _K_TILE)]            # [Kt]
        logdet = logdet_ref[pl.ds(kt * _K_TILE, _K_TILE)]        # [Kt]

        def one_comp(i, acc):
            maha_acc = acc
            # y_i = L_i^{-1} (x - mu_i): [N_TILE, D_pad] @ [D_pad, D_pad]
            ic = invchol_ref[kt * _K_TILE + i]                    # [D_pad, D_pad]
            diff = x - mu[i][None, :]
            y = jnp.dot(diff, ic.T, preferred_element_type=jnp.float32)
            maha = jnp.sum(y * y, axis=1)                         # [N_TILE]
            return maha_acc.at[:, i].set(maha)

        maha_all = jax.lax.fori_loop(
            0, _K_TILE, one_comp,
            jnp.zeros((n_tile, _K_TILE), jnp.float32),
        )
        logits = (
            -0.5 * maha_all - logdet[None, :] - 0.5 * d * LOG_2PI
            + logw[None, :]
        )  # [N_TILE, Kt]
        tile_max = jnp.max(logits, axis=1)
        new_max = jnp.maximum(run_max, tile_max)
        new_max_safe = jnp.where(jnp.isfinite(new_max), new_max, 0.0)
        scale = jnp.where(
            jnp.isfinite(run_max), jnp.exp(run_max - new_max_safe), 0.0
        )
        add = jnp.sum(
            jnp.where(
                jnp.isfinite(logits),
                jnp.exp(logits - new_max_safe[:, None]), 0.0
            ),
            axis=1,
        )
        return new_max, run_sum * scale + add

    init = (
        jnp.full((n_tile,), NEG_INF, jnp.float32),
        jnp.zeros((n_tile,), jnp.float32),
    )
    run_max, run_sum = jax.lax.fori_loop(0, k_tiles, k_step, init)
    run_max_safe = jnp.where(jnp.isfinite(run_max), run_max, 0.0)
    out = jnp.where(run_sum > 0, jnp.log(run_sum) + run_max_safe, NEG_INF)
    out_ref[...] = out


try:  # pallas import kept optional so CPU-only installs work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_call(means, inv_chols, log_weights, log_dets, samples,
                interpret=False):
    k, d_pad = means.shape
    n = samples.shape[0]
    k_tiles = k // _K_TILE
    n_tiles = n // _N_TILE

    kernel = functools.partial(
        _mixture_logpdf_kernel, k_tiles=k_tiles, d=int(d_pad), d_pad=d_pad
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, d_pad), lambda i: (0, 0)),
            pl.BlockSpec((k, d_pad, d_pad), lambda i: (0, 0, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((_N_TILE, d_pad), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_N_TILE,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        interpret=interpret,
    )(means, inv_chols, log_weights, log_dets, samples)


def fused_mixture_logpdf(means, inv_chols, log_weights, log_dets, samples,
                         use_pallas=None, interpret=False):
    """``[N]`` mixture log densities logsumexp_k(log_w_k + log N_k(x)).

    Args:
        means: ``[K, D]``; inv_chols: ``[K, D, D]`` (lower-triangular
        inverses); log_weights: ``[K]`` (use -inf to mask components);
        log_dets: ``[K]`` = log|L_k|; samples: ``[N, D]``.

    ``d`` in the Gaussian normalization uses the *true* D; padding dimensions
    carry zero diffs and identity inverse factors so they contribute nothing
    to the Mahalanobis term.
    """
    d = samples.shape[1]
    if use_pallas is None:
        use_pallas = (
            _HAVE_PALLAS and jax.default_backend() == "tpu"
        )
    if not use_pallas and not interpret:
        return _plain_mixture_logpdf(means, inv_chols, log_weights, log_dets,
                                     samples)

    k, n = means.shape[0], samples.shape[0]
    d_pad = _round_up(d, 128)
    k_pad = _round_up(k, _K_TILE)
    n_pad = _round_up(n, _N_TILE)

    means_p = jnp.zeros((k_pad, d_pad), jnp.float32).at[:k, :d].set(means)
    eye = jnp.eye(d_pad, dtype=jnp.float32)
    inv_p = jnp.tile(eye[None], (k_pad, 1, 1))
    inv_p = inv_p.at[:k, :d, :d].set(inv_chols)
    # zero out the cross blocks so padded dims don't mix with real dims
    inv_p = inv_p.at[:k, :d, d:].set(0.0)
    inv_p = inv_p.at[:k, d:, :d].set(0.0)
    logw_p = jnp.full((k_pad,), NEG_INF, jnp.float32).at[:k].set(log_weights)
    logdet_p = jnp.zeros((k_pad,), jnp.float32).at[:k].set(log_dets)
    samples_p = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(samples)

    # the kernel uses d_pad in the normalizer; correct with the difference
    out = _fused_call(means_p, inv_p, logw_p, logdet_p, samples_p,
                      interpret=interpret)
    correction = 0.5 * (d_pad - d) * LOG_2PI
    return out[:n] + correction
