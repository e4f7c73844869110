"""Mixture-weight updates: direct natural-gradient step and KL trust-region.

(reference: src/gmmvi/optimization/gmmvi_modules/weight_updater.py)

The expected per-component log-ratio estimate (and the component-reward
bookkeeping it feeds) is shared between both variants
(reference: weight_updater.py:56-75).  The trust-region variant's bracketing
search over the tempered-softmax stepsize is a fixed-trip ``lax.while_loop``
(reference: weight_updater.py:193-260).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gmmvi_tpu.models import meta as meta_ops
from gmmvi_tpu.models.gmm import (
    GmmState,
    log_densities_also_individual,
    normalize_log_weights,
)
from gmmvi_tpu.models.meta import MetaState
from gmmvi_tpu.ops.stable import masked_logsumexp, signed_weighted_logsumexp, NEG_INF

LOG_WEIGHT_FLOOR = -69.07  # lower-bounds weights at 1e-30 (weight_updater.py:139,187)


def expected_log_ratios(
    model: GmmState,
    meta: MetaState,
    samples: jnp.ndarray,       # [N, D]
    sample_mask: jnp.ndarray,   # [N]
    background: jnp.ndarray,    # [N]
    target_lnpdfs: jnp.ndarray,  # [N]
    temperature: float,
    use_self_normalized_importance_weights: bool,
    shard_fn=None,
) -> Tuple[jnp.ndarray, MetaState]:
    """Per-component MC estimate of E_{q(x|o)}[log p(x) - T log q(x)]; also
    stores the component rewards T*log w_o + E[log ratio] into the reward
    history (reference: weight_updater.py:56-75).  ``shard_fn`` pins the
    updated-model density pass to the mesh's sample axis."""
    model_densities, comp_log_densities = log_densities_also_individual(
        model, samples, shard_fn=shard_fn)
    log_ratios = target_lnpdfs - temperature * model_densities

    log_iw = comp_log_densities - background[None, :]
    mask = jnp.broadcast_to(sample_mask[None, :], log_iw.shape)

    if use_self_normalized_importance_weights:
        log_w = log_iw - masked_logsumexp(log_iw, mask=mask, axis=1, keepdims=True)
        w = jnp.where(mask, jnp.exp(log_w), 0.0)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-38)
        elr = w @ log_ratios
    else:
        n = jnp.maximum(jnp.sum(sample_mask.astype(jnp.float32)), 1.0)
        elr = (1.0 / n) * signed_weighted_logsumexp(
            log_iw, log_ratios[None, :], axis=1, mask=mask
        )

    rewards = temperature * model.log_weights + elr
    rewards = jnp.where(model.mask, rewards, meta.reward_history[:, -1])
    meta = meta_ops.store_rewards(meta, rewards)
    return elr, meta


def _apply_new_log_weights(model: GmmState, meta: MetaState, new_log_weights):
    """Replace weights and append to the weight history; skipped entirely when
    K == 1, like the reference (weight_updater.py:136, 275)."""
    def do_update(args):
        model, meta = args
        model = model.replace(
            log_weights=normalize_log_weights(new_log_weights, model.mask)
        )
        meta = meta_ops.store_weights(meta, model.weights)
        return model, meta

    return jax.lax.cond(
        model.num_active > 1, do_update, lambda args: args, (model, meta)
    )


def direct_weight_update(
    model: GmmState, meta: MetaState, elr: jnp.ndarray, stepsize, temperature: float
):
    """log w' propto log w + (stepsize/T) * E[log ratio], floored at 1e-30
    (reference: weight_updater.py:106-141). Skipped when K == 1."""
    unnormalized = model.log_weights + (stepsize / temperature) * elr
    lw = unnormalized - masked_logsumexp(unnormalized, mask=model.mask, axis=0)
    lw = jnp.maximum(lw, LOG_WEIGHT_FLOOR)
    return _apply_new_log_weights(model, meta, lw)


def _tr_weight_kl(eta, log_weights, mask, rewards, temperature):
    """Closed-form tempered-softmax update + its KL to the current weights
    (reference: weight_updater.py:164-191)."""
    unnormalized = (
        (eta + 1.0) / (temperature + eta) * log_weights
        + 1.0 / (temperature + eta) * rewards
    )
    lw = unnormalized - masked_logsumexp(unnormalized, mask=mask, axis=0)
    lw = jnp.maximum(lw, LOG_WEIGHT_FLOOR)
    lw = lw - masked_logsumexp(lw, mask=mask, axis=0)
    lw = jnp.where(mask, lw, NEG_INF)
    kl = jnp.sum(jnp.where(mask, jnp.exp(lw) * (lw - log_weights), 0.0))
    return kl, lw


def trust_region_weight_update(
    model: GmmState, meta: MetaState, elr: jnp.ndarray, kl_bound, temperature: float
):
    """Largest tempered-softmax step whose KL to the current weights stays
    within ``kl_bound``; log-space bracket over eta in [e^-45, e^45], <= 50
    iterations (reference: weight_updater.py:144-281). Keeps old weights when
    no feasible eta is found; skipped when K == 1."""
    mask = model.mask
    log_weights = jnp.where(mask, model.log_weights, NEG_INF)
    # the search rewards are the expected log ratios themselves
    # (reference: weight_updater.py:262-278 passes expected_log_ratios to kl())
    rewards = jnp.where(mask, elr, NEG_INF)

    def kl_at(eta):
        return _tr_weight_kl(eta, log_weights, mask, rewards, temperature)

    def cond(carry):
        _, _, _, _, _, _, _, done, it = carry
        return jnp.logical_and(jnp.logical_not(done), it < 50)

    def body(carry):
        lower, upper, log_eta, kl, eta, lw, upper_ok, done, it = carry
        new_eta = jnp.exp(log_eta)
        width_stop = jnp.abs(jnp.exp(upper) - jnp.exp(lower)) < 1e-1
        new_kl, new_lw = kl_at(new_eta)
        good = jnp.abs(kl_bound - new_kl) < 1e-1 * kl_bound

        adv = jnp.logical_not(width_stop)
        kl = jnp.where(adv, new_kl, kl)
        eta = jnp.where(adv, new_eta, eta)
        lw = jnp.where(adv, new_lw, lw)

        go_up = kl_bound > new_kl
        lower_n = jnp.where(adv & ~good & ~go_up, log_eta, lower)
        upper_n = jnp.where(adv & ~good & go_up, log_eta, upper)
        # good -> lower = upper (weight_updater.py:240-243)
        lower_n = jnp.where(adv & good, upper_n, lower_n)
        upper_ok = jnp.where(adv & ~good, upper_ok | go_up, upper_ok)
        log_eta_n = 0.5 * (upper_n + lower_n)
        done_n = width_stop | (adv & good)
        return lower_n, upper_n, log_eta_n, kl, eta, lw, upper_ok, done_n, it + 1

    lower0, upper0 = -45.0, 45.0
    log_eta0 = 0.5 * (lower0 + upper0)
    init = (
        jnp.asarray(lower0), jnp.asarray(upper0), jnp.asarray(log_eta0),
        jnp.asarray(-1.0), jnp.asarray(-1.0), log_weights, False, False, 0,
    )
    lower, upper, _, kl, eta, lw, upper_ok, _, _ = jax.lax.while_loop(
        cond, body, init
    )

    converged = lower == upper
    kl_u, lw_u = kl_at(jnp.exp(upper))
    new_lw = jnp.where(
        converged, lw, jnp.where(upper_ok, lw_u, log_weights)
    )
    return _apply_new_log_weights(model, meta, new_lw)
