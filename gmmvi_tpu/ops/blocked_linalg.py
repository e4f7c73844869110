"""Blocked batched Cholesky and triangular inversion in pure XLA ops.

XLA's stock ``cholesky`` on TPU restreams the trailing panel from HBM on
every column step: measured 4.66 ms for a ``[40, 300, 300]`` f32 batch on a
v5e (0.155 TFLOP/s — RESULTS_r04 "TR").  That batched factorization is the
hot body of the trust-region bisection at large D
(reference: src/gmmvi/optimization/gmmvi_modules/ng_based_component_updater.py:335-429),
so the D>64 trust-region path was the one remaining kernel-less hot loop.

These are LEFT-LOOKING blocked algorithms built from static-shape slices,
small per-panel ``lax.linalg`` calls, and large MXU matmuls — no Pallas, no
Mosaic (three Mosaic designs for this factorization failed to compile or
miscompiled in round 4; see RESULTS_r04 "TR").  The O(D^3) work lands in
``jnp.matmul`` panels; the sequential-per-column work shrinks from D full
trailing-panel streams to ``D/B`` small ``[B, B]`` factorizations.

All functions take ``[..., D, D]`` batches, operate in f32 with HIGHEST
precision matmuls, and propagate NaN on non-SPD inputs exactly like the XLA
primitives they replace (callers' NaN success masks are unchanged).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def tril_inverse(l: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse of a batched lower-triangular matrix.

    Dispatches to :func:`fast_tril_inverse` (all-matmul) above D=64 — the
    measured win over the column-sequential ``triangular_solve`` on TPU —
    and to the stock solve at small D, where the solve is cheap and keeping
    it preserves bit-identical trajectories for the small-D parity oracles.
    ``GMMVI_FAST_TRIL=0`` forces the stock solve everywhere, ``=1`` forces
    the matmul path everywhere.
    """
    if use_fast_tril(l.shape[-1]):
        return fast_tril_inverse(l)
    d = l.shape[-1]
    eye = jnp.eye(d, dtype=l.dtype)
    return jax.lax.linalg.triangular_solve(
        l, jnp.broadcast_to(eye, l.shape), left_side=True, lower=True)


def use_fast_tril(d: int) -> bool:
    """Shared trace-time predicate for the matmul-inverse dispatch (callers
    that pair :func:`tril_inverse` with an explicit-inverse solve use this
    to switch both together)."""
    mode = os.environ.get("GMMVI_FAST_TRIL", "auto")
    return mode != "0" and (mode == "1" or d > 64)


def _pad_spd(a: jnp.ndarray, dp: int) -> jnp.ndarray:
    """Embed ``a`` in the top-left of a [dp, dp] identity: the padded matrix
    stays SPD and its Cholesky is blockdiag(chol(a), I)."""
    d = a.shape[-1]
    if dp == d:
        return a
    batch = a.shape[:-2]
    eye = jnp.eye(dp, dtype=a.dtype)
    out = jnp.broadcast_to(eye, batch + (dp, dp))
    return jax.lax.dynamic_update_slice(
        out, a, (0,) * len(batch) + (0, 0)
    )


def blocked_cholesky(a: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """Lower Cholesky of a batched SPD matrix via left-looking B-wide panels.

    Per panel j (all batched over leading axes):
      1. ``A_jj - L_j,prev @ L_j,prev^T``  (MXU matmul over computed panels)
      2. factor the [B, B] diagonal block with the stock cholesky (small)
      3. ``L_bj = (A_bj - L_b,prev @ L_j,prev^T) @ inv(L_jj)^T`` (MXU)

    Identical result to ``jnp.linalg.cholesky`` up to float rounding; NaNs
    from a non-SPD diagonal block propagate into every later panel through
    the inv(L_jj) matmul chain, so ``jnp.any(jnp.isnan(...))`` failure masks
    behave exactly as with the stock primitive.
    """
    d = a.shape[-1]
    if d <= block:
        return jnp.linalg.cholesky(a)
    nb = -(-d // block)
    dp = nb * block
    ap = _pad_spd(a, dp)
    batch = ap.shape[:-2]
    eye_b = jnp.eye(block, dtype=a.dtype)

    l = jnp.zeros_like(ap)
    for j in range(nb):
        j0 = j * block
        j1 = j0 + block
        lj_prev = l[..., j0:j1, :j0]                       # [.., B, j0]
        a_jj = ap[..., j0:j1, j0:j1]
        if j0:
            a_jj = a_jj - jnp.einsum(
                "...ik,...jk->...ij", lj_prev, lj_prev, precision=_PREC)
        l_jj = jnp.linalg.cholesky(a_jj)                   # [.., B, B]
        blocks = [l_jj]
        if j1 < dp:
            inv_jj = jax.lax.linalg.triangular_solve(
                l_jj, jnp.broadcast_to(eye_b, batch + (block, block)),
                left_side=True, lower=True)
            a_bj = ap[..., j1:, j0:j1]
            if j0:
                lb_prev = l[..., j1:, :j0]
                a_bj = a_bj - jnp.einsum(
                    "...ik,...jk->...ij", lb_prev, lj_prev, precision=_PREC)
            l_bj = jnp.einsum(
                "...ik,...jk->...ij", a_bj, inv_jj, precision=_PREC)
            blocks.append(l_bj)
        col = jnp.concatenate(blocks, axis=-2)             # [.., dp-j0, B]
        l = jax.lax.dynamic_update_slice(
            l, col, (0,) * len(batch) + (j0, j0))
    return l[..., :d, :d]


def _tril_inv_pow2(l: jnp.ndarray, base: int = 16) -> jnp.ndarray:
    """Inverse of batched lower-triangular ``[..., nb, S, S]``-stackable
    blocks via recursive doubling; ``l`` is ``[..., dp, dp]`` with ``dp`` a
    multiple of a power-of-two run from ``base``.  Internal helper for
    :func:`fast_tril_inverse`; assumes ``dp % base == 0`` and the doubling
    chain divides ``dp`` (callers arrange dp = 128 * k and base = 16).

    Every step is a batched matmul:
      * base blocks: row-scale ``L = D (I + N)`` with N strictly lower and
        nilpotent (``N^base = 0``), so
        ``inv(I + N) = (I - N)(I + N^2)(I + N^4)...`` — log2(base)
        factors, 6 matmuls at base=16;
      * doubling S -> 2S: ``X21 = -X22 L21 X11`` on all sibling pairs at
        once (one einsum per level).
    """
    dp = l.shape[-1]
    batch = l.shape[:-2]
    nb = dp // base
    lr = l.reshape(batch + (nb, base, nb, base))
    # diagonal blocks via strided diagonal extraction (exact, no matmul)
    diag_blocks = jnp.moveaxis(
        jnp.diagonal(lr, axis1=-4, axis2=-2), -1, -3)       # [.., nb, S, S]

    # base case: D^{-1} row scaling + nilpotent Neumann product
    dvec = jnp.diagonal(diag_blocks, axis1=-2, axis2=-1)   # [.., nb, base]
    n = diag_blocks / dvec[..., :, None] - jnp.eye(base, dtype=l.dtype)
    p = jnp.eye(base, dtype=l.dtype) - n
    q = jnp.einsum("...ij,...jk->...ik", n, n, precision=_PREC)
    steps = 1
    while (1 << (steps + 1)) < base:
        p = jnp.einsum("...ij,...jk->...ik",
                       p, jnp.eye(base, dtype=l.dtype) + q, precision=_PREC)
        q = jnp.einsum("...ij,...jk->...ik", q, q, precision=_PREC)
        steps += 1
    p = jnp.einsum("...ij,...jk->...ik",
                   p, jnp.eye(base, dtype=l.dtype) + q, precision=_PREC)
    x = p / dvec[..., None, :]                              # [.., nb, S, S]

    s = base
    while s < dp and (dp // s) % 2 == 0:
        npairs = dp // (2 * s)
        sr = l.reshape(batch + (2 * npairs, s, 2 * npairs, s))
        # sub-diagonal pair blocks (2i+1, 2i): odd rows x even cols, then
        # the block-diagonal of that grid (exact strided extraction)
        sub = sr[..., 1::2, :, 0::2, :]                     # [.., np,s,np,s]
        l21 = jnp.moveaxis(
            jnp.diagonal(sub, axis1=-4, axis2=-2), -1, -3)  # [.., np, s, s]
        x11 = x[..., 0::2, :, :]
        x22 = x[..., 1::2, :, :]
        x21 = -jnp.einsum("...ij,...jk,...kl->...il", x22, l21, x11,
                          precision=_PREC)
        top = jnp.concatenate(
            [x11, jnp.zeros_like(x11)], axis=-1)
        bot = jnp.concatenate([x21, x22], axis=-1)
        x = jnp.concatenate([top, bot], axis=-2)            # [.., np, 2s, 2s]
        s *= 2
    nb = dp // s
    if nb == 1:
        return x[..., 0, :, :]
    # final O(nb^2) sweep over the remaining (non-power-of-two) block grid
    inv_d = [x[..., i, :, :] for i in range(nb)]
    blk = lambda i, j: l[..., i * s:(i + 1) * s, j * s:(j + 1) * s]
    out = [[None] * nb for _ in range(nb)]
    for j in range(nb):
        out[j][j] = inv_d[j]
        for i in range(j + 1, nb):
            acc = None
            for k in range(j, i):
                term = jnp.einsum("...ik,...kj->...ij", blk(i, k), out[k][j],
                                  precision=_PREC)
                acc = term if acc is None else acc + term
            out[i][j] = -jnp.einsum("...ik,...kj->...ij", inv_d[i], acc,
                                    precision=_PREC)
    zero = jnp.zeros_like(inv_d[0])
    rows = [jnp.concatenate([out[i][j] if j <= i else zero
                             for j in range(nb)], axis=-1)
            for i in range(nb)]
    return jnp.concatenate(rows, axis=-2)


def fast_tril_inverse(l: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse of a batched lower-triangular matrix with ZERO
    ``triangular_solve`` calls — every op is a batched matmul.

    XLA's ``triangular_solve`` against an identity RHS runs column-
    sequentially on TPU: measured 2.9 ms at ``[40, 300, 300]`` f32 on a v5e
    (0.12 TFLOP/s) — it, not the Cholesky (0.026 ms), is what made the
    large-D trust-region bisection expensive (RESULTS_r05; r4 misattributed
    this to the factorization).  This routine inverts 16x16 diagonal blocks
    with the nilpotent Neumann product, doubles block size to 128 with one
    batched einsum per level, and finishes with an O((D/128)^2) block sweep.

    Exact in exact arithmetic (the Neumann series TERMINATES for nilpotent
    N — this is not an approximation); float error stays within a few ulps
    of the substitution-based solve for the well-conditioned whitened
    factors it serves.  NaNs propagate block-wise into every dependent
    block, so ``jnp.any(jnp.isnan(...))`` failure masks behave as with the
    stock primitive.
    """
    d = l.shape[-1]
    dp = max(128, -(-d // 128) * 128)
    lp = _pad_spd(l, dp)  # identity-extend: inverse of the pad is the pad
    x = _tril_inv_pow2(lp, base=16)
    return x[..., :d, :d]


def blocked_tril_inverse(l: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """Explicit inverse of a batched lower-triangular matrix, blockwise.

    ``X_jj = inv(L_jj)``; below the diagonal, column-block sweep
    ``X_ij = -inv(L_ii) @ sum_k L_ik X_kj`` — O((D/B)^2) MXU matmuls plus
    D/B small triangular solves, replacing the stock column-sequential
    ``triangular_solve(L, I)`` whose trailing-panel restreams mirror the
    stock cholesky's.  NaN inputs propagate to every output block that
    depends on them (same failure-mask behavior).
    """
    d = l.shape[-1]
    if d <= block:
        eye = jnp.eye(d, dtype=l.dtype)
        return jax.lax.linalg.triangular_solve(
            l, jnp.broadcast_to(eye, l.shape), left_side=True, lower=True)
    nb = -(-d // block)
    dp = nb * block
    lp = _pad_spd(l, dp)  # identity-extend: inverse of the pad is the pad
    batch = lp.shape[:-2]
    eye_b = jnp.broadcast_to(jnp.eye(block, dtype=l.dtype),
                             batch + (block, block))

    # one batched solve for ALL diagonal blocks: stack them on a new axis
    diag = jnp.stack(
        [lp[..., i * block:(i + 1) * block, i * block:(i + 1) * block]
         for i in range(nb)], axis=-3)                     # [.., nb, B, B]
    inv_diag = jax.lax.linalg.triangular_solve(
        diag, jnp.broadcast_to(jnp.eye(block, dtype=l.dtype), diag.shape),
        left_side=True, lower=True)
    inv_d = [inv_diag[..., i, :, :] for i in range(nb)]

    # x[i][j] blocks of the inverse, filled column-block by column-block
    x = [[None] * nb for _ in range(nb)]
    for j in range(nb):
        x[j][j] = inv_d[j]
        for i in range(j + 1, nb):
            s = None
            for k in range(j, i):
                term = jnp.einsum(
                    "...ik,...kj->...ij",
                    lp[..., i * block:(i + 1) * block,
                       k * block:(k + 1) * block],
                    x[k][j], precision=_PREC)
                s = term if s is None else s + term
            x[i][j] = -jnp.einsum(
                "...ik,...kj->...ij", inv_d[i], s, precision=_PREC)
    zero = jnp.zeros_like(eye_b)
    rows = [
        jnp.concatenate(
            [x[i][j] if j <= i else zero for j in range(nb)], axis=-1)
        for i in range(nb)
    ]
    return jnp.concatenate(rows, axis=-2)[..., :d, :d]
