"""Whitened importance-weighted ridge regression of a quadratic surrogate.

TPU-native equivalent of the reference's ``QuadFunc.fit_quadratic``
(reference: src/gmmvi/optimization/least_squares.py:93-191): fit
``R~(x) = x^T Q x + x^T r + r0`` by weighted least squares on quadratic
features, with whitening by the sampling Gaussian and an unregularized bias.

Differences: masked samples (static shapes) and a single vectorizable function
that is ``vmap``/``lax.map``-able over components.  The normal-equation solve
``(X^T W X + reg) theta = X^T W y`` builds its Gram matrix with one matmul
(MXU) instead of per-feature loops.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def triu_indices(dim: int):
    return jnp.triu_indices(dim)


def fit_linear(
    regularizer: jnp.ndarray,
    inputs: jnp.ndarray,   # [N, D]
    outputs: jnp.ndarray,  # [N]
    weights: jnp.ndarray = None,
    mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Weighted ridge regression of a linear-plus-bias model; returns
    ``[D + 1]`` coefficients (bias last, unregularized).
    (reference: least_squares.py:79-90, LinFunc)"""
    n, d = inputs.shape
    feats = jnp.concatenate([inputs, jnp.ones((n, 1), inputs.dtype)], axis=1)
    if weights is None:
        weights = jnp.ones((n,), inputs.dtype)
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)
    wf = weights[:, None] * feats
    gram = jnp.einsum("nf,ng->fg", wf, feats, precision=_PREC)
    rhs = jnp.einsum("nf,n->f", wf, outputs, precision=_PREC)
    reg = regularizer * jnp.eye(d + 1, dtype=inputs.dtype)
    reg = reg.at[d, d].set(0.0)
    return jnp.linalg.solve(gram + reg, rhs)


def quadratic_features(x: jnp.ndarray) -> jnp.ndarray:
    """Features [x_i x_j (i<=j), x, 1] of shape ``[N, D(D+1)/2 + D + 1]``.

    Same ordering as reference least_squares.py:113-124 (row-major upper
    triangle: x_0*x_{0:}, x_1*x_{1:}, ...).  Built as a full outer product
    + one column take: the two-gather form ``x[:, iu] * x[:, ju]`` measured
    ~25% slower at the ZAMTRON stm20 shape on v5e (gathers are VPU-serial;
    the outer product is a dense broadcast multiply).
    """
    n, d = x.shape
    iu, ju = jnp.triu_indices(d)
    outer = (x[:, :, None] * x[:, None, :]).reshape(n, d * d)
    quad = jnp.take(outer, iu * d + ju, axis=1)
    const = jnp.ones((n, 1), x.dtype)
    return jnp.concatenate([quad, x, const], axis=1)


def fit_quadratic(
    regularizer: jnp.ndarray,
    inputs: jnp.ndarray,        # [N, D]
    outputs: jnp.ndarray,       # [N]
    weights: jnp.ndarray,       # [N] importance weights (>= 0)
    sample_mean: jnp.ndarray,   # [D]
    sample_inv_chol: jnp.ndarray,  # [D, D] lower (or [D] diagonal)
    mask: jnp.ndarray = None,   # [N] bool; False entries are ignored
    diagonal: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (quad_term [D,D], lin_term [D], const_term) such that the fitted
    surrogate is ``-0.5 x^T quad_term x``-style MORE coefficients — precisely:
    ``quad_term = -(qt + qt^T)`` with qt the upper-tri fit, matching reference
    least_squares.py:177-189 including the whitening/unwhitening transform.
    """
    d = inputs.shape[1]
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)

    # whitening: z = L^{-1}(x - mu) (reference: least_squares.py:171-173)
    centered = inputs - sample_mean
    if diagonal:
        z = centered * sample_inv_chol[None, :]
    else:
        z = jnp.einsum("ij,nj->ni", sample_inv_chol, centered, precision=_PREC)

    feats = quadratic_features(z)  # [N, F]
    wf = weights[:, None] * feats
    gram = jnp.einsum("nf,ng->fg", wf, feats, precision=_PREC)
    rhs = jnp.einsum("nf,n->f", wf, outputs, precision=_PREC)
    return solve_quadratic_normal_eqs(
        gram, rhs, regularizer, sample_mean, sample_inv_chol,
        diagonal=diagonal)


def solve_quadratic_normal_eqs(
    gram: jnp.ndarray,             # [F, F]
    rhs: jnp.ndarray,              # [F]
    regularizer: jnp.ndarray,
    sample_mean: jnp.ndarray,      # [D]
    sample_inv_chol: jnp.ndarray,  # [D, D] lower (or [D] diagonal)
    diagonal: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve + unwhiten given the weighted normal equations over the
    whitened quadratic features (the tail of :func:`fit_quadratic`; the
    gram/rhs may come from the fused Pallas kernel,
    :func:`gmmvi_tpu.ops.pallas_more.fused_more_grams`)."""
    f = gram.shape[0]
    d = sample_mean.shape[0]
    dtype = gram.dtype
    reg = regularizer * jnp.eye(f, dtype=dtype)
    reg = reg.at[f - 1, f - 1].set(0.0)  # bias unregularized (least_squares.py:71-73)
    # the ridge-regularized Gram is SPD, so solve by Cholesky: TPU's pivoted
    # LU (jnp.linalg.solve) measured ~20 ms across K=48 fits per ZAMTRON
    # stm20 iteration (the reference's tf.linalg.solve is LU on CPU where
    # pivoting is cheap)
    chol = jnp.linalg.cholesky(gram + reg)
    params = jax.scipy.linalg.cho_solve((chol, True), rhs)

    iu, ju = jnp.triu_indices(d)
    qt = jnp.zeros((d, d), dtype).at[iu, ju].set(params[: f - (d + 1)])
    quad_term = -qt - qt.T
    lin_term = params[f - (d + 1): f - 1]
    const_term = params[f - 1]

    # unwhitening (reference: least_squares.py:184-189)
    if diagonal:
        quad_w = sample_inv_chol[:, None] * quad_term * sample_inv_chol[None, :]
        t1 = sample_inv_chol * lin_term
    else:
        quad_w = jnp.einsum(
            "ji,jk,kl->il", sample_inv_chol, quad_term, sample_inv_chol,
            precision=_PREC,
        )
        t1 = jnp.einsum("ji,j->i", sample_inv_chol, lin_term, precision=_PREC)
    t2 = quad_w @ sample_mean
    lin_w = t1 + t2
    const_w = const_term + jnp.sum(sample_mean * (-0.5 * t2 - t1))
    return quad_w, lin_w, const_w
