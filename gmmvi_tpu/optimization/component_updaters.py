"""Natural-gradient component updates: direct, iBLR, and KL trust-region.

Updates every Gaussian component from the estimated negated expected Hessians
and gradients, with per-component stepsizes
(reference: src/gmmvi/optimization/gmmvi_modules/ng_based_component_updater.py).

TPU-native design: the reference loops over components in Python and bails out
per component; here every variant is a ``vmap``-ed pure function over the
padded component axis, failures are success masks resolved with ``jnp.where``
(keep old parameters), and the trust-region bracketing search is a fixed-trip
``lax.while_loop`` that runs in lockstep across components.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gmmvi_tpu.models.gmm import GmmState, replace_components
from gmmvi_tpu.models.meta import MetaState
from gmmvi_tpu.ops.blocked_linalg import tril_inverse, use_fast_tril

_PREC = jax.lax.Precision.HIGHEST
F32_MAX = jnp.finfo(jnp.float32).max


class ComponentUpdateResult(NamedTuple):
    model: GmmState
    meta: MetaState


def _finish_update(model, meta, new_means, new_chols, successes, etas=None,
                   new_inv_chols=None):
    """Shared post-update bookkeeping: l2-regularizer adaptation (halve on
    success floored at the initial value, x10 capped at 1e-6 on failure),
    update counters, replace parameters
    (reference: ng_based_component_updater.py:135-141, 217-223, 513-524)."""
    mask = model.mask
    new_l2 = jnp.where(
        successes,
        jnp.maximum(0.5 * meta.l2_regularizers, meta.initial_regularizer),
        jnp.minimum(1e-6, 10.0 * meta.l2_regularizers),
    )
    meta = meta.replace(
        l2_regularizers=jnp.where(mask, new_l2, meta.l2_regularizers),
        num_received_updates=meta.num_received_updates + mask.astype(jnp.float32),
    )
    if etas is not None:
        meta = meta.replace(
            last_etas=jnp.where(mask, etas, meta.last_etas)
        )
    model = replace_components(model, new_means, new_chols,
                               new_inv_chols=new_inv_chols)
    return ComponentUpdateResult(model, meta)


def _chol_pair_from_prec(new_prec: jnp.ndarray):
    """Lower Cholesky of ``inv(new_prec)`` AND its inverse, without an LU
    inverse or a second Cholesky.

    Exchange identity: with ``P~ = flip(P)`` (both matrix axes reversed) and
    ``Lt = chol(P~)``, the unique lower Cholesky of ``P^-1`` is
    ``flip(Lt^-T)`` and its inverse is ``flip(Lt^T)`` (free).  One Cholesky +
    one triangular inversion replaces the reference-shaped
    ``chol(inv(P))`` chain (ng_based_component_updater.py:113-118 uses
    tf.linalg.inv + cholesky); TPU's pivoted-LU inverse measured ~2x the cost
    of the entire remaining update at D=300 (RESULTS_r02.md).

    Returns ``(chol_of_inv, inv_of_that_chol)``; NaNs propagate to both
    outputs when ``new_prec`` is not SPD, so callers' NaN success masks see
    failures exactly as before.
    """
    pf = new_prec[..., ::-1, ::-1]
    lt = jnp.linalg.cholesky(pf)
    # explicit triangular inversion: all-matmul above D=64 (the stock
    # column-sequential solve measured 2.9 ms at [40, 300, 300] on a v5e —
    # see ops/blocked_linalg.tril_inverse); NaNs still propagate
    lt_inv = tril_inverse(lt)
    new_chol = jnp.swapaxes(lt_inv, -1, -2)[..., ::-1, ::-1]
    new_inv_chol = jnp.swapaxes(lt, -1, -2)[..., ::-1, ::-1]
    return new_chol, new_inv_chol


def _old_canonical(model: GmmState):
    """Per-component precision-space quantities from the cached inverse chols."""
    if model.diagonal:
        old_prec = jnp.square(model.inv_chols)             # [K, D]
        old_lin = old_prec * model.means
    else:
        old_prec = jnp.einsum(
            "kji,kjl->kil", model.inv_chols, model.inv_chols, precision=_PREC
        )
        old_lin = jnp.einsum("kij,kj->ki", old_prec, model.means, precision=_PREC)
    return old_prec, old_lin


# ---------------------------------------------------------------------------
# Direct update (reference: ng_based_component_updater.py:83-141)
# ---------------------------------------------------------------------------

def direct_update(
    model: GmmState, meta: MetaState,
    hessians_neg: jnp.ndarray, grads_neg: jnp.ndarray, stepsizes: jnp.ndarray,
    temperature: float = 1.0,
) -> ComponentUpdateResult:
    old_prec, old_lin = _old_canonical(model)
    s = stepsizes
    if model.diagonal:
        delta_lin = hessians_neg * model.means - grads_neg
        new_prec = old_prec + s[:, None] * hessians_neg
        new_lin = old_lin + s[:, None] * delta_lin
        new_mean = new_lin / new_prec
        new_chol = jnp.sqrt(1.0 / new_prec)
        success = jnp.logical_not(jnp.any(jnp.isnan(new_chol), axis=-1))
    else:
        delta_lin = (
            jnp.einsum("kij,kj->ki", hessians_neg, model.means, precision=_PREC)
            - grads_neg
        )
        new_prec = old_prec + s[:, None, None] * hessians_neg
        new_lin = old_lin + s[:, None] * delta_lin
        new_chol, new_inv_chol = _chol_pair_from_prec(new_prec)
        # solve new_prec @ mean = new_lin with the factors already in hand:
        # inv(P) = new_chol @ new_chol^T
        new_mean = jnp.einsum(
            "kij,kj->ki", new_chol,
            jnp.einsum("kji,kj->ki", new_chol, new_lin, precision=_PREC),
            precision=_PREC,
        )
        success = jnp.logical_not(
            jnp.any(jnp.isnan(new_chol), axis=(-2, -1))
            | jnp.any(jnp.isnan(new_mean), axis=-1)
        )

    sel = success & model.mask
    new_mean = jnp.where(sel[:, None], new_mean, model.means)
    if model.diagonal:
        new_chol = jnp.where(sel[:, None], new_chol, model.chols)
        new_inv_chol = None
    else:
        new_chol = jnp.where(sel[:, None, None], new_chol, model.chols)
        new_inv_chol = jnp.where(sel[:, None, None], new_inv_chol,
                                 model.inv_chols)
    return _finish_update(model, meta, new_mean, new_chol, success,
                          new_inv_chols=new_inv_chol)


# ---------------------------------------------------------------------------
# iBLR update (reference: ng_based_component_updater.py:144-223)
# ---------------------------------------------------------------------------

def iblr_update(
    model: GmmState, meta: MetaState,
    hessians_neg: jnp.ndarray, grads_neg: jnp.ndarray, stepsizes: jnp.ndarray,
    temperature: float = 1.0,
) -> ComponentUpdateResult:
    """Improved Bayesian learning rule with curvature correction
    eta/2 * H Sigma H; no mean update on a component's first update."""
    old_prec, _ = _old_canonical(model)
    s = stepsizes
    first = meta.num_received_updates == 0
    if model.diagonal:
        cov = jnp.square(model.chols)
        correction = 0.5 * s[:, None] * hessians_neg * cov * hessians_neg
        new_prec = old_prec + s[:, None] * (hessians_neg + correction)
        mean_step = s[:, None] * cov * (-grads_neg)
        new_mean = jnp.where(first[:, None], model.means, model.means + mean_step)
        new_cov = 1.0 / new_prec
        new_chol = jnp.sqrt(new_cov)
        success = jnp.logical_not(jnp.any(jnp.isnan(new_chol), axis=-1))
        sel = success & model.mask
        new_mean = jnp.where(sel[:, None], new_mean, model.means)
        new_chol = jnp.where(sel[:, None], new_chol, model.chols)
        new_inv_chol = None
    else:
        cov = jnp.einsum("kij,klj->kil", model.chols, model.chols, precision=_PREC)
        hc = jnp.einsum("kij,kjl->kil", hessians_neg, cov, precision=_PREC)
        correction = 0.5 * s[:, None, None] * jnp.einsum(
            "kij,kjl->kil", hc, hessians_neg, precision=_PREC
        )
        new_prec = old_prec + s[:, None, None] * (hessians_neg + correction)
        mean_step = s[:, None] * jnp.einsum(
            "kij,kj->ki", cov, -grads_neg, precision=_PREC
        )
        new_mean = jnp.where(first[:, None], model.means, model.means + mean_step)
        new_chol, new_inv_chol = _chol_pair_from_prec(new_prec)
        success = jnp.logical_not(jnp.any(jnp.isnan(new_chol), axis=(-2, -1)))
        sel = success & model.mask
        new_mean = jnp.where(sel[:, None], new_mean, model.means)
        new_chol = jnp.where(sel[:, None, None], new_chol, model.chols)
        new_inv_chol = jnp.where(sel[:, None, None], new_inv_chol,
                                 model.inv_chols)
    return _finish_update(model, meta, new_mean, new_chol, success,
                          new_inv_chols=new_inv_chol)


# ---------------------------------------------------------------------------
# KL trust-region update (reference: ng_based_component_updater.py:226-527)
# ---------------------------------------------------------------------------

def _tr_kl_full(eta, old_lin, old_prec, old_inv_chol, reward_lin, reward_quad,
                kl_const, old_mean):
    """KL(new || old) for the exponential-family interpolation at stepsize eta
    (reference: ng_based_component_updater.py:299-333, full-covariance path).
    Returns (kl, new_mean, inv_chol_of_precision_chol)."""
    d = old_mean.shape[0]
    new_lin = (eta * old_lin + reward_lin) / eta
    new_prec = (eta * old_prec + reward_quad) / eta
    chol_p = jnp.linalg.cholesky(new_prec)
    bad = jnp.any(jnp.isnan(chol_p))
    chol_p_safe = jnp.where(bad, jnp.eye(d, dtype=chol_p.dtype), chol_p)
    new_mean = jax.scipy.linalg.cho_solve((chol_p_safe, True), new_lin)
    new_logdet = -2.0 * jnp.sum(jnp.log(jnp.diag(chol_p_safe)))
    inv_chol_p = jax.scipy.linalg.solve_triangular(
        chol_p_safe, jnp.eye(d, dtype=chol_p.dtype), lower=True
    )
    trace_term = jnp.sum(
        jnp.square(inv_chol_p @ old_inv_chol.T)
    )
    diff = old_mean - new_mean
    kl = 0.5 * (
        kl_const - new_logdet + trace_term
        + jnp.sum(jnp.square(old_inv_chol @ diff))
    )
    kl = jnp.where(bad, F32_MAX, kl)
    new_mean = jnp.where(bad, old_mean, new_mean)
    inv_chol_p = jnp.where(bad, old_inv_chol, inv_chol_p)
    return kl, new_mean, inv_chol_p


def _tr_whitened_precompute(old_mean, old_chol, old_inv_chol, reward_lin,
                            reward_quad):
    """Once-per-step whitening of the trust-region interpolation.

    With ``Sigma_old = L L^T`` the interpolated precision factors as
    ``P(eta) = L^{-T} (I + M/eta) L^{-1}`` with the whitened curvature
    ``M = L^T R L`` — two MXU matmuls computed ONCE, after which every
    bisection trip only needs the Cholesky of the well-conditioned
    ``S = I + M/eta`` plus one triangular inversion (2/3 D^3 of
    sequential-solve FLOPs per trip instead of the direct form's 4/3 D^3:
    the trace solve against old_inv_chol^T disappears into the identity).
    Exactly the same KL as :func:`_tr_kl_full` in exact arithmetic:

        KL(eta) = 0.5 [ logdet S + tr(S^{-1}) - d + ||c - z(eta)||^2 ],
        z(eta)  = S^{-1} (c + b1/eta),  c = L^{-1} mu_old,  b1 = L^T r_lin

    (uses L^T lin_old = L^T P_old mu_old = L^{-1} mu_old = c).
    """
    m_w = jnp.einsum("ji,jk,kl->il", old_chol, reward_quad, old_chol,
                     precision=_PREC)
    c = jnp.einsum("ij,j->i", old_inv_chol, old_mean, precision=_PREC)
    b1 = jnp.einsum("ji,j->i", old_chol, reward_lin, precision=_PREC)
    return m_w, c, b1


def _tr_kl_whitened_trip(eta, m_w, c, b1):
    """Per-trip KL in the whitened parameterization (see
    :func:`_tr_whitened_precompute`); F32_MAX when S = I + M/eta is not PD
    — the same rejection signal as the direct form's NaN Cholesky
    (new_prec PD <=> S PD)."""
    d = c.shape[0]
    eye = jnp.eye(d, dtype=m_w.dtype)
    s = m_w / eta + eye
    lc = jnp.linalg.cholesky(s)
    bad = jnp.any(jnp.isnan(lc))
    lc_safe = jnp.where(bad, eye, lc)
    logdet_s = 2.0 * jnp.sum(jnp.log(jnp.diag(lc_safe)))
    inv_lc = tril_inverse(lc_safe)
    trace = jnp.sum(jnp.square(inv_lc))
    rhs = c + b1 / eta
    if use_fast_tril(d):
        # the explicit inverse is already in hand — the z-solve becomes two
        # matvecs (each 1-RHS triangular_solve measured 2.9 ms at D=300)
        z = jnp.einsum("ji,j->i", inv_lc,
                       jnp.einsum("ij,j->i", inv_lc, rhs, precision=_PREC),
                       precision=_PREC)
    else:
        z = jax.scipy.linalg.cho_solve((lc_safe, True), rhs)
    kl = 0.5 * (logdet_s + trace - d + jnp.sum(jnp.square(c - z)))
    return (jnp.where(bad, F32_MAX, kl),)


def _tr_kl_whitened_trip_grad(eta, m_w, c, b1):
    """KL and dKL/d(log eta) from ONE factorization (the Newton search's
    trip body).  With S = I + M/eta, rhs = c + b1/eta, z = S^-1 rhs and
    q = c - z, differentiating in t = log eta (dS/dt = I - S, S z = rhs):

        dKL/dt = 0.5 * (tr(S^-2) - d - 2 q^T S^-1 q)

    — every term reuses the explicit inverse the trip already computes, so
    the derivative costs one extra [D, D] matmul.  F32_MAX / 0 on non-PD."""
    d = c.shape[0]
    eye = jnp.eye(d, dtype=m_w.dtype)
    s = m_w / eta + eye
    lc = jnp.linalg.cholesky(s)
    bad = jnp.any(jnp.isnan(lc))
    lc_safe = jnp.where(bad, eye, lc)
    logdet_s = 2.0 * jnp.sum(jnp.log(jnp.diag(lc_safe)))
    w = tril_inverse(lc_safe)
    sinv = jnp.einsum("ji,jk->ik", w, w, precision=_PREC)
    t1 = jnp.trace(sinv)
    t2 = jnp.sum(jnp.square(sinv))
    rhs = c + b1 / eta
    z = jnp.einsum("ij,j->i", sinv, rhs, precision=_PREC)
    q = c - z
    kl = 0.5 * (logdet_s + t1 - d + jnp.sum(jnp.square(q)))
    # d logdet/dt = T1 - d;  d tr(S^-1)/dt = T1 - T2;  d||q||^2/dt =
    # -2 q^T S^-1 q  =>  dKL/dt = 0.5 (2 T1 - d - T2) - q^T S^-1 q
    # = -0.5 sum_i (1/lambda_i - 1)^2 - q^T S^-1 q  <= 0 (KL decreasing)
    dkl = 0.5 * (2.0 * t1 - d - t2) - jnp.einsum(
        "i,ij,j->", q, sinv, q, precision=_PREC)
    return jnp.where(bad, F32_MAX, kl), jnp.where(bad, 0.0, dkl)


def _newton_search(kl_grad_fn, kl_bound, lower0, upper0, warm_t, active=None):
    """Safeguarded Newton search for the trust-region stepsize in log space.

    Same contract as :func:`_bracketing_search` — returns the largest eta
    with ``|KL - bound| < 0.1 * bound`` (or the bracket-collapse fallback)
    under the same stopping rules — but each trip takes a Newton step on
    ``KL(log eta) - bound`` (clipped into the current sign bracket, falling
    back to bisection when the step leaves it, the derivative degenerates,
    or the point is infeasible), instead of blind bisection.  KL is convex
    decreasing in log eta over the PD region, so the safeguarded iteration
    converges quadratically: 2-3 factorizations per component instead of
    the bisection's ~6 at stm300 shapes (RESULTS_r05).  The visited etas
    differ from the reference's bisection sequence, but the accepted eta
    satisfies the identical trust-region tolerance
    (reference: ng_based_component_updater.py:335-429; deviation noted in
    PARITY_MAP.md)."""
    done0 = jnp.asarray(False) if active is None else jnp.logical_not(active)
    t0 = jnp.where(jnp.isfinite(warm_t), warm_t, 0.5 * (lower0 + upper0))
    t0 = jnp.clip(t0, lower0, upper0)

    def cond(carry):
        _, _, _, _, done, it = carry
        return jnp.logical_and(jnp.logical_not(done), it < 1000)

    def body(carry):
        lower, upper, t, upper_ok, done, it = carry
        eta = jnp.exp(t)
        kl, dkl = kl_grad_fn(eta)
        good = jnp.abs(kl_bound - kl) < 1e-1 * kl_bound
        go_low = kl_bound > kl  # feasible (KL below bound) -> shrink upper

        new_lower = jnp.where(good, t, jnp.where(go_low, lower, t))
        new_upper = jnp.where(good, t, jnp.where(go_low, t, upper))
        new_upper_ok = jnp.where(good, upper_ok,
                                 jnp.logical_or(upper_ok, go_low))
        width = jnp.exp(new_upper) - jnp.exp(new_lower)
        done_now = jnp.logical_or(good, width < 1e-1)

        # Newton step in t, clipped to the open bracket; bisect otherwise
        t_newton = t - (kl - kl_bound) / dkl
        mid = 0.5 * (new_lower + new_upper)
        inside = jnp.logical_and(t_newton > new_lower, t_newton < new_upper)
        ok = jnp.logical_and(jnp.isfinite(t_newton),
                             jnp.logical_and(dkl < 0.0, inside))
        t_next = jnp.where(ok, t_newton, mid)
        return (new_lower, new_upper, t_next, new_upper_ok, done_now, it + 1)

    lower, upper, _, upper_ok, _, _ = jax.lax.while_loop(
        cond, body,
        (lower0, upper0, t0, jnp.asarray(False), done0,
         jnp.asarray(0, jnp.int32)),
    )
    lower = jnp.where(upper_ok, upper, lower)
    return jnp.exp(lower), jnp.exp(upper)


def _tr_kl_full_trip(eta, old_lin, old_prec, old_inv_chol, reward_lin,
                     reward_quad, kl_const, old_mean):
    """Per-trip KL only — the bisection's hot body.

    Same KL value as :func:`_tr_kl_full` (the trace term's
    ``inv(chol_p) @ old_inv_chol^T`` is evaluated as one triangular solve
    instead of an explicit triangular inversion followed by a matmul), but
    never materializes the factors the search doesn't need.  At D=300 the
    removed inverse+matmul were ~half of every trip's FLOPs."""
    d = old_mean.shape[0]
    new_lin = (eta * old_lin + reward_lin) / eta
    new_prec = (eta * old_prec + reward_quad) / eta
    chol_p = jnp.linalg.cholesky(new_prec)
    bad = jnp.any(jnp.isnan(chol_p))
    chol_p_safe = jnp.where(bad, jnp.eye(d, dtype=chol_p.dtype), chol_p)
    new_logdet = -2.0 * jnp.sum(jnp.log(jnp.diag(chol_p_safe)))
    if use_fast_tril(d):
        # explicit matmul inverse: one pass replaces the 1-RHS cho_solve
        # AND the [D, D]-RHS trace solve (both column-sequential on TPU)
        w = tril_inverse(chol_p_safe)
        new_mean = jnp.einsum(
            "ji,j->i", w, jnp.einsum("ij,j->i", w, new_lin, precision=_PREC),
            precision=_PREC)
        half = jnp.einsum("ij,kj->ik", w, old_inv_chol, precision=_PREC)
    else:
        new_mean = jax.scipy.linalg.cho_solve((chol_p_safe, True), new_lin)
        half = jax.scipy.linalg.solve_triangular(
            chol_p_safe, old_inv_chol.T, lower=True
        )
    diff = old_mean - new_mean
    kl = 0.5 * (
        kl_const - new_logdet + jnp.sum(jnp.square(half))
        + jnp.sum(jnp.square(old_inv_chol @ diff))
    )
    return (jnp.where(bad, F32_MAX, kl),)


def _tr_final_full(eta, old_lin, old_prec, old_inv_chol, reward_lin,
                   reward_quad, kl_const, old_mean):
    """KL + updated parameters at the accepted eta.

    One flipped Cholesky yields BOTH the new covariance Cholesky and its
    inverse (:func:`_chol_pair_from_prec`) — no triangular inversion, no
    second Cholesky of the reconstructed covariance, and the inv_chol cache
    refresh in ``replace_components`` is skipped (the reference reconstructs
    via explicit inversion, ng_based_component_updater.py:478-497).
    Returns ``(kl, new_mean, new_chol, new_inv_chol)``."""
    d = old_mean.shape[0]
    new_lin = (eta * old_lin + reward_lin) / eta
    new_prec = (eta * old_prec + reward_quad) / eta
    new_chol, new_inv_chol = _chol_pair_from_prec(new_prec)
    bad = jnp.any(jnp.isnan(new_chol))
    eye = jnp.eye(d, dtype=new_chol.dtype)
    chol_safe = jnp.where(bad, eye, new_chol)
    inv_safe = jnp.where(bad, eye, new_inv_chol)
    # new_mean = Sigma_new @ new_lin with Sigma_new = chol @ chol^T
    new_mean = jnp.einsum(
        "ij,j->i", chol_safe,
        jnp.einsum("ji,j->i", chol_safe, new_lin, precision=_PREC),
        precision=_PREC,
    )
    new_logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(chol_safe)))
    # tr(Lambda_old Sigma_new) = ||L_old^-1 L_new||_F^2
    trace_term = jnp.sum(jnp.square(old_inv_chol @ chol_safe))
    diff = old_mean - new_mean
    kl = 0.5 * (
        kl_const - new_logdet + trace_term
        + jnp.sum(jnp.square(old_inv_chol @ diff))
    )
    kl = jnp.where(bad, F32_MAX, kl)
    new_mean = jnp.where(bad, old_mean, new_mean)
    return kl, new_mean, chol_safe, inv_safe


def _tr_kl_diag(eta, old_lin, old_prec, old_inv_chol, reward_lin, reward_quad,
                kl_const, old_mean):
    """Diagonal variant with the numerically-stabler form
    (reference: ng_based_component_updater.py:304-317)."""
    d = old_mean.shape[0]
    new_lin = (eta * old_lin + reward_lin) / eta
    new_prec = (eta * old_prec + reward_quad) / eta
    chol_prec = jnp.sqrt(new_prec)
    new_mean = new_lin / new_prec
    inv_chol_p = 1.0 / chol_prec
    diff = old_mean - new_mean
    kl = 0.5 * (
        jnp.maximum(
            0.0,
            jnp.sum(jnp.log(new_prec / old_prec) + old_prec / new_prec) - d,
        )
        + jnp.sum(jnp.square(old_inv_chol * diff))
    )
    return kl, new_mean, inv_chol_p


def _bracketing_search(kl_fn, kl_bound, lower0, upper0, active=None):
    """Log-space bracketing search for the largest stepsize satisfying the KL
    bound (reference: ng_based_component_updater.py:335-429).  Up to 1000
    iterations; stops when the bracket width (in eta space) is < 0.1 or
    |KL - bound| < 0.1 * bound (then lower = upper = eta).  The visited eta
    sequence, bracket updates, and stopping decisions are exactly the
    sequential reference search's.

    ``active=False`` marks a padded slot: its search is skipped outright
    (done at trip 0).  Under vmap the while_loop runs in lockstep to the
    slowest slot, and cold inactive slots measured MORE trips (11) than
    warm active ones (4-7) at stm300 — without this, padding dictated the
    whole search's trip count.  The reference has no padded slots, so
    skipping them cannot change any reference-visible trajectory.
    """
    done0 = jnp.asarray(False) if active is None else jnp.logical_not(active)

    def cond(carry):
        _, _, _, done, it = carry
        return jnp.logical_and(jnp.logical_not(done), it < 1000)

    def body(carry):
        lower, upper, upper_ok, done, it = carry
        eta = 0.5 * (lower + upper)
        kl = kl_fn(jnp.exp(eta))[0]
        # reference order: width-stop checked before evaluating KL
        diff = jnp.minimum(
            jnp.exp(upper) - jnp.exp(eta), jnp.exp(eta) - jnp.exp(lower)
        )
        stop_width = diff < 1e-1
        good = jnp.abs(kl_bound - kl) < 1e-1 * kl_bound
        go_low = kl_bound > kl  # KL below bound -> decrease eta

        lower = jnp.where(
            stop_width, lower,
            jnp.where(good, eta, jnp.where(go_low, lower, eta)),
        )
        upper = jnp.where(
            stop_width, upper,
            jnp.where(good, eta, jnp.where(go_low, eta, upper)),
        )
        upper_ok = jnp.where(
            jnp.logical_and(~stop_width, ~good),
            jnp.logical_or(upper_ok, go_low),
            upper_ok,
        )
        done = jnp.logical_or(stop_width, good)
        return lower, upper, upper_ok, done, it + 1

    lower, upper, upper_ok, _, _ = jax.lax.while_loop(
        cond, body,
        (lower0, upper0, jnp.asarray(False), done0,
         jnp.asarray(0, jnp.int32)),
    )
    # if the search didn't converge but the upper bound satisfies the
    # constraint, use it (ng_based_component_updater.py:421-424)
    lower = jnp.where(upper_ok, upper, lower)
    return jnp.exp(lower), jnp.exp(upper)


def _bracketing_search_batched(kl_eval, kl_bound, lower0, upper0,
                               active=None):
    """Array form of :func:`_bracketing_search`: all carries are [K] vectors
    and ``kl_eval`` maps etas [K] -> KLs [K] in one call (the Pallas batched
    KL kernel).  Semantically identical to vmapping the scalar search — the
    vmapped ``while_loop`` already runs in lockstep with masked per-element
    updates; this version just replaces its per-trip batched Cholesky chain
    with one fused kernel call."""

    def cond(carry):
        _, _, _, done, it = carry
        return jnp.any(jnp.logical_and(jnp.logical_not(done), it < 1000))

    def body(carry):
        lower, upper, upper_ok, done, it = carry
        active = jnp.logical_and(jnp.logical_not(done), it < 1000)
        eta = 0.5 * (lower + upper)
        kl = kl_eval(jnp.exp(eta))
        diff = jnp.minimum(
            jnp.exp(upper) - jnp.exp(eta), jnp.exp(eta) - jnp.exp(lower)
        )
        stop_width = diff < 1e-1
        good = jnp.abs(kl_bound - kl) < 1e-1 * kl_bound
        go_low = kl_bound > kl

        new_lower = jnp.where(
            stop_width, lower,
            jnp.where(good, eta, jnp.where(go_low, lower, eta)),
        )
        new_upper = jnp.where(
            stop_width, upper,
            jnp.where(good, eta, jnp.where(go_low, eta, upper)),
        )
        new_upper_ok = jnp.where(
            jnp.logical_and(~stop_width, ~good),
            jnp.logical_or(upper_ok, go_low),
            upper_ok,
        )
        new_done = jnp.logical_or(stop_width, good)

        lower = jnp.where(active, new_lower, lower)
        upper = jnp.where(active, new_upper, upper)
        upper_ok = jnp.where(active, new_upper_ok, upper_ok)
        done = jnp.where(active, new_done, done)
        it = jnp.where(active, it + 1, it)
        return lower, upper, upper_ok, done, it

    k = lower0.shape[0]
    done0 = (jnp.zeros((k,), bool) if active is None
             else jnp.logical_not(active))
    lower, upper, upper_ok, _, _ = jax.lax.while_loop(
        cond, body,
        (lower0, upper0, jnp.zeros((k,), bool), done0,
         jnp.zeros((k,), jnp.int32)),
    )
    lower = jnp.where(upper_ok, upper, lower)
    return jnp.exp(lower), jnp.exp(upper)


def _tr_pallas_mode() -> str:
    """'pallas' | 'interpret' | 'off' for the batched trust-region KL kernel
    (GMMVI_FUSED_TR=0 disables, =1 forces, =interpret for CPU tests)."""
    import os

    from gmmvi_tpu.models import gmm as gmm_module

    mode = os.environ.get("GMMVI_FUSED_TR", "auto")
    if mode == "0":
        return "off"
    if mode == "interpret":
        return "interpret"
    if gmm_module.SPMD_ACTIVE and mode != "1":
        mesh = gmm_module.SPMD_MESH
        if mesh is None or "comp" in mesh.axis_names:
            # on hybrid meshes the [K, D, D] bisection chains are
            # comp-sharded by design — wrapping the kernel replicated would
            # all-gather them every trip, so the comp-sharded XLA path wins
            return "off"
        # pure data mesh: all kernel operands are replicated — the kernel
        # shard_map-wraps with fully-replicated specs (each device runs the
        # same tiny [K] search, like the XLA path effectively does)
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    if mode == "1" or on_tpu:
        return "pallas"
    return "off"


def _trust_region_update_pallas(model, meta, hessians_neg, grads_neg,
                                stepsizes, temperature, interpret=False):
    """Full-covariance trust-region update with the per-trip KL evaluation
    fused into one Pallas kernel (gmmvi_tpu/ops/pallas_trust_region.py).

    The bisection's visited-eta sequence and stopping decisions match
    :func:`_bracketing_search` (the kernel computes the same KL as
    :func:`_tr_kl_full` to ~1e-6 relative); the final accepted update is
    reconstructed with the XLA path at the found eta."""
    from gmmvi_tpu.ops import pallas_trust_region as ptr

    means, chols, inv_chols = model.means, model.chols, model.inv_chols
    k, d = means.shape
    reward_quad = hessians_neg
    reward_lin = jnp.einsum("kij,kj->ki", reward_quad, means,
                            precision=_PREC) - grads_neg
    old_prec, old_lin = _old_canonical(model)
    old_logdet = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(chols, axis1=-2, axis2=-1))), -1)
    kl_const = old_logdet - d

    packed = ptr.prepare_tr_kl_inputs(means, chols, inv_chols,
                                      reward_lin, reward_quad)

    from gmmvi_tpu.models import gmm as gmm_module

    mesh = gmm_module.SPMD_MESH if gmm_module.SPMD_ACTIVE else None
    if mesh is not None:
        # pure data mesh (hybrid meshes are gated off in _tr_pallas_mode):
        # every operand is replicated, so wrap the opaque kernel in a
        # fully-replicated shard_map — each device runs the same tiny [K]
        # KL evaluation, no collectives
        from jax import shard_map

        rep = jax.sharding.PartitionSpec()

        def kl_eval(etas):
            return shard_map(
                lambda e, pk: ptr.batched_tr_kl(e, pk, d=d,
                                                interpret=interpret),
                mesh=mesh, in_specs=(rep, rep), out_specs=rep,
                check_vma=False,
            )(etas, packed)
    else:
        kl_eval = lambda etas: ptr.batched_tr_kl(etas, packed, d=d,
                                                 interpret=interpret)

    last = meta.last_etas
    no_warm = last < 0
    log_last = jnp.log(jnp.abs(last) + 1e-30)
    lower0 = jnp.where(no_warm, -20.0, jnp.maximum(0.0, log_last - 3.0))
    upper0 = jnp.where(no_warm, 80.0, log_last + 3.0)

    exp_lower, exp_upper = _bracketing_search_batched(
        kl_eval, stepsizes, lower0, upper0, active=model.mask)
    eta = jnp.maximum(exp_lower, temperature)  # (reference line 476)
    success = exp_lower == exp_upper

    kl, new_means, new_chols, new_inv_chols = jax.vmap(_tr_final_full)(
        eta, old_lin, old_prec, inv_chols, reward_lin, reward_quad,
        kl_const, means)
    success = success & (kl < F32_MAX)

    sel = success & model.mask
    new_means = jnp.where(sel[:, None], new_means, means)
    new_chols = jnp.where(sel[:, None, None], new_chols, chols)
    new_inv_chols = jnp.where(sel[:, None, None], new_inv_chols, inv_chols)
    etas = jnp.where(success, eta, -1.0)
    return _finish_update(model, meta, new_means, new_chols, success,
                          etas=etas, new_inv_chols=new_inv_chols)


def _tr_grid_search(kl_fn, kl_bound, lower0, upper0, grid_size):
    """Two-level parallel grid search for the trust-region stepsize.

    TPU-first alternative to the sequential bisection: KL(eta) is decreasing
    in eta (larger eta = smaller step), so the optimal stepsize is the
    smallest eta whose KL stays within the bound.  Two batched evaluations of
    a log-spaced grid bracket it to ~(range/grid_size^2) log-accuracy —
    2 parallel Cholesky batches instead of up to 1000 dependent iterations.
    Returns (eta, feasible)."""
    g1 = jnp.linspace(lower0, upper0, grid_size)
    kls1 = jax.vmap(lambda le: kl_fn(jnp.exp(le))[0])(g1)
    feas1 = kls1 <= kl_bound  # NaN compares False -> infeasible
    any1 = jnp.any(feas1)
    idx1 = jnp.argmax(feas1)
    lo = g1[jnp.maximum(idx1 - 1, 0)]
    hi = jnp.where(any1, g1[idx1], upper0)

    g2 = jnp.linspace(lo, hi, grid_size)
    kls2 = jax.vmap(lambda le: kl_fn(jnp.exp(le))[0])(g2)
    feas2 = kls2 <= kl_bound
    idx2 = jnp.argmax(feas2)
    eta_log = jnp.where(jnp.any(feas2), g2[idx2], hi)
    return jnp.exp(eta_log), any1


def _tr_eigen_precompute(old_mean, old_chol, reward_lin, reward_quad):
    """Spectral reparameterization of the KL along the trust-region path.

    With ``L = chol(cov_old)`` and the whitened curvature
    ``R~ = L^T R L = U diag(lam) U^T``, every quantity the bisection needs
    becomes elementwise in the eigenbasis:

        new_prec(eta) = L^{-T} U diag(1 + lam/eta) U^T L^{-1}
        KL(eta) = 0.5 [ sum log1p(lam/eta) - sum lam/(eta+lam)
                        + sum ((lam*c - b)/(eta+lam))^2 ]

    with ``c = U^T L^{-1} mu_old`` and ``b = U^T L^T reward_lin``.  One
    batched eigh per component per step replaces a Cholesky + two
    triangular solves *per bisection trip* — the search loop becomes pure
    [D]-elementwise math, which matters because under vmap the while_loop
    runs to the slowest component's trip count (cold-started brackets span
    log-eta [-20, 80], ~100 trips).  Mathematically identical to the
    reference's KL (ng_based_component_updater.py:299-333) up to float
    rounding."""
    rw = jnp.einsum("ji,jk,kl->il", old_chol, reward_quad, old_chol,
                    precision=_PREC)
    rw = 0.5 * (rw + rw.T)
    lam, u = jnp.linalg.eigh(rw)
    zm = jax.scipy.linalg.solve_triangular(old_chol, old_mean, lower=True)
    c = jnp.einsum("ji,j->i", u, zm, precision=_PREC)
    b = jnp.einsum("ji,j->i", u, jnp.einsum(
        "ji,j->i", old_chol, reward_lin, precision=_PREC), precision=_PREC)
    return lam, u, c, b


def _tr_kl_eigen(eta, lam, c, b):
    """KL(eta) in the eigenbasis; F32_MAX when the interpolated precision is
    not positive definite (the cholesky-NaN rejection signal of the
    reference, ng_based_component_updater.py:488-497)."""
    denom = eta + lam
    bad = jnp.logical_not(jnp.all(denom > 0.0))
    safe = jnp.where(bad, jnp.ones_like(denom), denom)
    lam_safe = jnp.where(bad, jnp.zeros_like(lam), lam)
    kl = 0.5 * (
        jnp.sum(jnp.log1p(lam_safe / eta))
        - jnp.sum(lam_safe / safe)
        + jnp.sum(jnp.square((lam_safe * c - b) / safe))
    )
    return jnp.where(bad, F32_MAX, kl)


def _tr_update_one(old_mean, old_chol, old_inv_chol, last_eta, eps, hneg, gneg,
                   active, temperature, diagonal, search="bracket",
                   grid_size=32):
    """Trust-region update for one component
    (reference: ng_based_component_updater.py:439-511).

    ``search="bracket"`` follows the reference's bisection exactly with the
    direct Cholesky-based KL; ``search="bracket-eigen"`` evaluates the KL in
    the spectral parameterization instead; ``search="grid"`` is the batched
    two-level grid alternative."""
    d = old_mean.shape[0]
    reward_quad = hneg
    if diagonal:
        reward_lin = reward_quad * old_mean - gneg
        old_logdet = 2.0 * jnp.sum(jnp.log(old_chol))
        old_prec = jnp.square(old_inv_chol)
        old_lin = old_prec * old_mean
        kl_core = _tr_kl_diag
    else:
        reward_lin = (
            jnp.einsum("ij,j->i", reward_quad, old_mean, precision=_PREC) - gneg
        )
        old_logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(old_chol)))
        old_prec = jnp.einsum("ji,jl->il", old_inv_chol, old_inv_chol,
                              precision=_PREC)
        old_lin = jnp.einsum("ij,j->i", old_prec, old_mean, precision=_PREC)
        kl_core = _tr_kl_full_trip
    kl_const = old_logdet - d

    if not diagonal and search in ("bracket", "newton"):
        # whitened per-trip KL: half the sequential-solve FLOPs per trip
        # for two one-time MXU matmuls (see _tr_whitened_precompute)
        m_w, c_w, b1_w = _tr_whitened_precompute(
            old_mean, old_chol, old_inv_chol, reward_lin, reward_quad)
        kl_fn = partial(_tr_kl_whitened_trip, m_w=m_w, c=c_w, b1=b1_w)
    else:
        kl_fn = partial(
            kl_core,
            old_lin=old_lin, old_prec=old_prec, old_inv_chol=old_inv_chol,
            reward_lin=reward_lin, reward_quad=reward_quad,
            kl_const=kl_const, old_mean=old_mean,
        )

    # warm-started log-space bracket (ng_based_component_updater.py:462-471)
    no_warm = last_eta < 0
    lower0 = jnp.where(no_warm, -20.0, jnp.maximum(0.0, jnp.log(jnp.abs(last_eta) + 1e-30) - 3.0))
    upper0 = jnp.where(no_warm, 80.0, jnp.log(jnp.abs(last_eta) + 1e-30) + 3.0)

    if search == "bracket-eigen" and not diagonal:
        # spectral path: the bisection evaluates elementwise KL only.
        # NOTE: measured SLOWER than the Cholesky path on the v5e at the
        # flagship shape (batched eigh costs ~0.8 ms sequential latency on
        # the critical path vs ~40 us/trip for the Cholesky KL), so it is
        # opt-in (tpu.trust_region_search: bracket-eigen); it may win at
        # much larger D or trip counts.
        lam, u, cvec, bvec = _tr_eigen_precompute(
            old_mean, old_chol, reward_lin, reward_quad
        )
        exp_lower, exp_upper = _bracketing_search(
            lambda e: (_tr_kl_eigen(e, lam, cvec, bvec),), eps, lower0,
            upper0, active=active
        )
        eta = jnp.maximum(exp_lower, temperature)  # (reference line 476)
        success = exp_lower == exp_upper

        kl = _tr_kl_eigen(eta, lam, cvec, bvec)
        denom = eta + lam
        pd_ok = jnp.all(denom > 0.0)
        safe = jnp.where(pd_ok, denom, jnp.ones_like(denom))
        m_tilde = (eta * cvec + bvec) / safe
        new_mean = jnp.einsum("ij,j->i", old_chol,
                              jnp.einsum("ij,j->i", u, m_tilde,
                                         precision=_PREC), precision=_PREC)
        # new_cov = (L U) diag(eta/denom) (L U)^T
        half = jnp.einsum("ij,jk->ik", old_chol, u, precision=_PREC) \
            * jnp.sqrt(jnp.maximum(eta / safe, 0.0))[None, :]
        new_cov = jnp.einsum("ij,kj->ik", half, half, precision=_PREC)
        new_chol = jnp.linalg.cholesky(new_cov)
        chol_ok = pd_ok & jnp.logical_not(jnp.any(jnp.isnan(new_chol)))
        success = success & (kl < F32_MAX) & chol_ok

        new_mean = jnp.where(success, new_mean, old_mean)
        # post-selection new_chol is always finite (old_chol on failure), so
        # invert it directly; the final where keeps the cached old_inv_chol
        # bit-exact on failure instead of a re-inverted copy
        new_chol = jnp.where(success, new_chol, old_chol)
        new_inv_chol = jax.scipy.linalg.solve_triangular(
            new_chol, jnp.eye(d, dtype=new_chol.dtype), lower=True)
        new_inv_chol = jnp.where(success, new_inv_chol, old_inv_chol)
        eta_out = jnp.where(success, eta, -1.0)
        return new_mean, new_chol, new_inv_chol, success, eta_out

    if search == "grid":
        eta0, success = _tr_grid_search(
            lambda e: kl_fn(e), eps, lower0, upper0, grid_size
        )
        eta = jnp.maximum(eta0, temperature)
    elif search == "newton" and not diagonal:
        # cold start: KL(eta) ~ C / eta^2 asymptotically (second-order
        # expansion of logdet/trace/mean terms in M/eta), so eta0 =
        # sqrt(C/eps) starts the safeguarded iteration near the root
        # instead of at the bracket midpoint
        c_asym = (0.25 * jnp.sum(jnp.square(m_w))
                  + 0.5 * jnp.sum(jnp.square(
                      jnp.einsum("ij,j->i", m_w, c_w, precision=_PREC)
                      - b1_w)))
        t_guess = 0.5 * (jnp.log(c_asym + 1e-30) - jnp.log(eps))
        warm_t = jnp.where(no_warm, t_guess,
                           jnp.log(jnp.abs(last_eta) + 1e-30))
        exp_lower, exp_upper = _newton_search(
            partial(_tr_kl_whitened_trip_grad, m_w=m_w, c=c_w, b1=b1_w),
            eps, lower0, upper0, warm_t, active=active
        )
        eta = jnp.maximum(exp_lower, temperature)  # (reference line 476)
        success = exp_lower == exp_upper
    else:
        exp_lower, exp_upper = _bracketing_search(
            lambda e: kl_fn(e), eps, lower0, upper0, active=active
        )
        eta = jnp.maximum(exp_lower, temperature)  # (reference line 476)
        success = exp_lower == exp_upper

    if diagonal:
        kl, new_mean, inv_chol_p = kl_fn(eta)
        new_chol = jnp.sqrt(jnp.square(inv_chol_p))
        new_inv_chol = 1.0 / new_chol
        chol_ok = jnp.logical_not(jnp.any(jnp.isnan(new_chol)))
        success = success & (kl < F32_MAX) & chol_ok
        new_inv_chol = jnp.where(success, new_inv_chol, old_inv_chol)
    else:
        kl, new_mean, new_chol, new_inv_chol = _tr_final_full(
            eta, old_lin=old_lin, old_prec=old_prec,
            old_inv_chol=old_inv_chol, reward_lin=reward_lin,
            reward_quad=reward_quad, kl_const=kl_const, old_mean=old_mean,
        )
        success = success & (kl < F32_MAX)
        new_inv_chol = jnp.where(success, new_inv_chol, old_inv_chol)

    new_mean = jnp.where(success, new_mean, old_mean)
    new_chol = jnp.where(success, new_chol, old_chol)
    eta_out = jnp.where(success, eta, -1.0)
    return new_mean, new_chol, new_inv_chol, success, eta_out


def trust_region_update(
    model: GmmState, meta: MetaState,
    hessians_neg: jnp.ndarray, grads_neg: jnp.ndarray, stepsizes: jnp.ndarray,
    temperature: float = 1.0,
    search: str = "bracket",
    grid_size: int = 32,
) -> ComponentUpdateResult:
    """KL-constrained natural gradient step for every component; the stepsize
    is the trust-region bound epsilon (reference: ng_based_component_updater.py:431-524).

    ``search="bracket"`` reproduces the reference's sequential bisection;
    ``search="grid"`` (tpu.trust_region_search: grid) finds the stepsize with
    two fully-batched grid passes — much lower latency on accelerators, same
    trust-region semantics up to grid resolution.

    On TPU the full-covariance bracket path fuses each trip's batched KL
    evaluation into one Pallas kernel (see
    :mod:`gmmvi_tpu.ops.pallas_trust_region`).
    """
    if search == "bracket" and not model.diagonal:
        from gmmvi_tpu.ops import pallas_trust_region as ptr

        mode = _tr_pallas_mode()
        if mode != "off" and ptr.supports(model.num_dimensions,
                                          model.max_components):
            return _trust_region_update_pallas(
                model, meta, hessians_neg, grads_neg, stepsizes,
                temperature, interpret=(mode == "interpret"))
        # D > 64 keeps the XLA bracket.  Three kernel designs for the
        # large-D trip were built and measured in round 4 (RESULTS_r04 §TR):
        # a monolithic unrolled blocked factorization (Mosaic compile did
        # not finish in 30 min at D=384), a roll/prefix-sum variant (this
        # Mosaic version crashes or miscompiles lane-1 broadcasts and
        # sub-(8,128) stores), and a hybrid 64-block Pallas + XLA-einsum
        # driver (compiled, but 24 ms/trip — 5x the XLA bracket's 4.9 —
        # and miscompiled to zeros on-device).  A speculative multi-eta
        # wave breaks even exactly (batched-Cholesky time is sublinear in
        # batch but not flat), and lax.linalg.tridiagonal has no TPU
        # lowering.  See TODO.md "Performance".
    upd = jax.vmap(
        partial(_tr_update_one, temperature=temperature,
                diagonal=model.diagonal, search=search, grid_size=grid_size)
    )
    new_means, new_chols, new_inv_chols, successes, etas = upd(
        model.means, model.chols, model.inv_chols, meta.last_etas, stepsizes,
        hessians_neg, grads_neg, model.mask,
    )
    sel = successes & model.mask
    new_means = jnp.where(sel[:, None], new_means, model.means)
    if model.diagonal:
        new_chols = jnp.where(sel[:, None], new_chols, model.chols)
        new_inv_chols = jnp.where(sel[:, None], new_inv_chols,
                                  model.inv_chols)
    else:
        new_chols = jnp.where(sel[:, None, None], new_chols, model.chols)
        new_inv_chols = jnp.where(sel[:, None, None], new_inv_chols,
                                  model.inv_chols)
    return _finish_update(model, meta, new_means, new_chols, successes,
                          etas=etas, new_inv_chols=new_inv_chols)


UPDATERS = {
    "direct": direct_update,
    "iBLR": iblr_update,
    "trust-region": trust_region_update,
}
