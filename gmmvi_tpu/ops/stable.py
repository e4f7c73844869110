"""Numerically-stable reductions used throughout the framework.

These mirror the semantics the reference relies on from
``tfp.math.reduce_weighted_logsumexp`` with signs
(reference: src/gmmvi/optimization/gmmvi_modules/ng_estimator.py:146-152) but
are written as masked, statically-shaped JAX ops so they can run inside one
compiled program and respect active-component / valid-sample masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf
F32_MIN = jnp.finfo(jnp.float32).min


def masked_logsumexp(a, mask=None, axis=None, keepdims=False, return_sign=False):
    """logsumexp over `axis` treating entries with mask==False as -inf.

    Safe when an entire reduction slice is masked out (returns -inf there, with
    zero sign), and safe under reverse-mode AD.
    """
    if mask is not None:
        a = jnp.where(mask, a, NEG_INF)
    amax = jnp.max(a, axis=axis, keepdims=True)
    amax_safe = jnp.where(jnp.isfinite(amax), amax, 0.0)
    expd = jnp.exp(a - amax_safe)
    if mask is not None:
        expd = jnp.where(mask, expd, 0.0)
    s = jnp.sum(expd, axis=axis, keepdims=True)
    out = jnp.log(jnp.maximum(s, 0.0)) + amax_safe
    out = jnp.where(s > 0, out, NEG_INF)
    if not keepdims:
        out = jnp.squeeze(out, axis=axis) if axis is not None else jnp.squeeze(out)
    if return_sign:
        sign = jnp.where(s > 0, 1.0, 0.0)
        if not keepdims and axis is not None:
            sign = jnp.squeeze(sign, axis=axis)
        return out, sign
    return out


def signed_weighted_logsumexp(log_w, values, axis=0, mask=None):
    """Computes ``sum_i exp(log_w_i) * values_i`` stably.

    Equivalent to the reference's signed ``reduce_weighted_logsumexp`` trick:
    ``sign(v) * exp(logsumexp(log_w + log|v|))`` summed over `axis`
    (reference: ng_estimator.py:146-152, weight_updater.py:66-71).

    Broadcasts ``log_w`` against ``values``; entries where ``mask`` is False
    (or where ``values == 0``) contribute nothing.
    """
    log_abs = jnp.log(jnp.abs(values))
    combined = log_w + log_abs
    valid = jnp.isfinite(combined)
    if mask is not None:
        valid = jnp.logical_and(valid, mask)
    combined = jnp.where(valid, combined, NEG_INF)
    cmax = jnp.max(combined, axis=axis, keepdims=True)
    cmax_safe = jnp.where(jnp.isfinite(cmax), cmax, 0.0)
    signs = jnp.sign(values)
    total = jnp.sum(jnp.where(valid, signs * jnp.exp(combined - cmax_safe), 0.0),
                    axis=axis, keepdims=True)
    # re-apply the shift in log space (sign * exp(log|total| + cmax)), like
    # the reference's sign * exp(lswe): the linear form total * exp(cmax)
    # would overflow to inf whenever exp(cmax) alone exceeds float range,
    # even though the product is representable
    out = jnp.sign(total) * jnp.exp(jnp.log(jnp.abs(total)) + cmax_safe)
    return jnp.squeeze(out, axis=axis)


def masked_softmax(logits, mask=None, axis=-1):
    """Softmax with masked entries receiving probability zero."""
    lse = masked_logsumexp(logits, mask=mask, axis=axis, keepdims=True)
    p = jnp.exp(logits - jnp.where(jnp.isfinite(lse), lse, 0.0))
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    return p
