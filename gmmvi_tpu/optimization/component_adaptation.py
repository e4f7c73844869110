"""Adapting the number of components: VIPS add/delete heuristics.

(reference: src/gmmvi/optimization/gmmvi_modules/component_adaptation.py)

TPU-native design: the number of components changes, but array shapes never
do — adding writes into the next free slot of the padded state, deleting is a
compaction gather applied to model + meta-state in lockstep.  The decision
logic runs under ``lax.cond`` so the whole thing lives inside the compiled
training step.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from gmmvi_tpu.models import gmm as gmm_ops
from gmmvi_tpu.models import meta as meta_ops
from gmmvi_tpu.models.gmm import GmmState, LOG_2PI
from gmmvi_tpu.models.meta import MetaState
from gmmvi_tpu.optimization import sample_db as db_ops
from gmmvi_tpu.optimization.sample_db import SampleDbState

F32_MIN = jnp.finfo(jnp.float32).min


@struct.dataclass
class AdaptationState:
    num_calls_to_add_heuristic: jnp.ndarray  # int32 (component_adaptation.py:167)


def create_adaptation_state() -> AdaptationState:
    return AdaptationState(num_calls_to_add_heuristic=jnp.asarray(0, jnp.int32))


class VipsConfig(NamedTuple):
    """Static hyperparameters (component_adaptation.py:145-175).

    ``prior_entropy`` is the entropy of the diagonal candidate prior
    N(prior_mean, diag(initial_cov)) precomputed at build time; None when no
    prior was configured (then the desired entropy is the model average
    entropy alone, component_adaptation.py:209-212).
    """

    del_iters: int
    add_iters: int
    max_components: int
    thresholds_for_add_heuristic: Tuple[float, ...]
    min_weight_for_del_heuristic: float
    num_database_samples: int
    num_prior_samples: int
    prior_entropy: Optional[float] = None


def smoothing_kernel(del_iters: int) -> jnp.ndarray:
    """Gaussian smoothing kernel over the reward history
    (component_adaptation.py:172-175): sigma = del_iters/8, support
    [-floor(del_iters/3), floor(del_iters/3)), normalized to sum 1."""
    fd = int(math.floor(del_iters / 3))
    x = jnp.arange(-fd, fd, dtype=jnp.float32)
    sigma = del_iters / 8.0
    k = jnp.exp(-0.5 * jnp.square(x / sigma))
    return k / jnp.sum(k)


def delete_bad_components(
    model: GmmState, meta: MetaState, cfg: VipsConfig
) -> Tuple[GmmState, MetaState]:
    """Delete stagnating, low-weight, old-enough components
    (component_adaptation.py:261-300).  The three criteria:

    1. smoothed-reward relative improvement vs del_iters ago <= 0.4
    2. max(actual recent weight, hypothetical greedy softmax weight) below
       min_weight_for_del_heuristic
    3. at least del_iters updates received (reward history entry set)
    """
    kernel = smoothing_kernel(cfg.del_iters)
    ksize = kernel.shape[0]
    di = cfg.del_iters
    rh = meta.reward_history
    # reference uses reduce_mean of (window * kernel) — kernel sums to 1 so
    # this is smoothed/ksize, a pure rescale that cancels in the ratio below
    current = jnp.mean(rh[:, -ksize:] * kernel[None, :], axis=1)
    old = jnp.mean(rh[:, -ksize - di:-di] * kernel[None, :], axis=1)

    cmax = jnp.max(jnp.where(model.mask, current, -jnp.inf))
    old_c = old - cmax
    cur_c = current - cmax
    improvement = (cur_c - old_c) / jnp.abs(old_c)

    max_actual = jnp.max(meta.weight_history[:, -ksize - di:-1], axis=1)
    win = rh[:, -ksize - di:]
    greedy = jnp.exp(
        win
        - jax.scipy.special.logsumexp(
            jnp.where(model.mask[:, None], win, -jnp.inf), axis=0, keepdims=True
        )
    )
    max_greedy = jnp.max(jnp.where(model.mask[:, None], greedy, 0.0), axis=1)
    max_weights = jnp.maximum(max_actual, max_greedy)

    is_stagnating = improvement <= 0.4
    is_low_weight = max_weights < cfg.min_weight_for_del_heuristic
    is_old_enough = rh[:, -di] != F32_MIN
    is_bad = is_stagnating & is_low_weight & is_old_enough & model.mask

    # deletions are rare (every few hundred iterations in steady state); the
    # compaction gathers + inverse-Cholesky refresh only run when one fires
    # (the reference likewise only mutates variables for bad components,
    # component_adaptation.py:292-300)
    def compact(args):
        model, meta = args
        keep = jnp.logical_and(model.mask, jnp.logical_not(is_bad))
        order = gmm_ops.compaction_order(
            jnp.where(model.mask, keep, False)
        )
        return (
            gmm_ops.remove_components(model, keep),
            meta_ops.remove_components_meta(meta, order),
        )

    return jax.lax.cond(
        jnp.any(is_bad), compact, lambda args: args, (model, meta)
    )


def diagonal_gaussian_entropy(cov_diag) -> float:
    """Entropy of N(mu, diag(cov_diag)) — for the candidate prior."""
    import numpy as np

    cov_diag = np.asarray(cov_diag)
    d = cov_diag.shape[0]
    return float(0.5 * d * (LOG_2PI + 1.0) + 0.5 * np.sum(np.log(cov_diag)))


def add_new_component(
    model: GmmState,
    meta: MetaState,
    adapt: AdaptationState,
    db: SampleDbState,
    cfg: VipsConfig,
    key: jnp.ndarray,
    prior_samples: Optional[jnp.ndarray] = None,
    prior_lnpdfs: Optional[jnp.ndarray] = None,
) -> Tuple[GmmState, MetaState, AdaptationState, SampleDbState]:
    """Add one component at the most promising candidate location
    (component_adaptation.py:192-259).

    Candidates come from the sample reservoir (and optionally fresh prior
    samples whose target log-densities must be supplied by the caller — they
    count as function evaluations).  The reward of a candidate is
    ``target - max(max_model_logdensity - threshold, model_logdensity)`` with a
    cycling threshold list; the new covariance is isotropic with entropy
    interpolated between the model average entropy and the prior entropy.
    """
    db_key, a_key = jax.random.split(key)
    samples, lnpdfs, valid = db_ops.get_random_samples(
        db, db_key, cfg.num_database_samples
    )
    if prior_samples is not None:
        samples = jnp.concatenate([samples, prior_samples], axis=0)
        lnpdfs = jnp.concatenate([lnpdfs, prior_lnpdfs], axis=0)
        valid = jnp.concatenate(
            [valid, jnp.ones(prior_samples.shape[0], jnp.bool_)]
        )
        db = db.replace(
            num_samples_written=db.num_samples_written + prior_samples.shape[0]
        )

    thresholds = jnp.asarray(cfg.thresholds_for_add_heuristic, jnp.float32)
    t_idx = adapt.num_calls_to_add_heuristic % thresholds.shape[0]
    threshold = thresholds[t_idx]
    adapt = adapt.replace(
        num_calls_to_add_heuristic=adapt.num_calls_to_add_heuristic + 1
    )

    model_ld = gmm_ops.log_density(model, samples)
    a = jax.random.uniform(a_key, ())
    avg_h = gmm_ops.average_entropy(model)
    if cfg.prior_entropy is not None:
        des_entropy = avg_h * a + cfg.prior_entropy * (1.0 - a)
    else:
        des_entropy = avg_h

    max_ld = jnp.max(jnp.where(valid, model_ld, -jnp.inf))
    rewards = lnpdfs - jnp.maximum(max_ld - threshold, model_ld)
    rewards = jnp.where(valid, rewards, -jnp.inf)
    best = jnp.argmax(rewards)
    new_mean = samples[best]

    d = model.num_dimensions
    h_unscaled = 0.5 * d * (LOG_2PI + 1.0)
    c = jnp.exp(2.0 * (des_entropy - h_unscaled) / d)
    if model.diagonal:
        new_cov = c * jnp.ones(d)
    else:
        new_cov = c * jnp.eye(d)

    slot = jnp.minimum(model.num_active, model.max_components - 1)
    has_room = model.num_active < model.max_components
    init_weight = jnp.asarray(1e-29, jnp.float32)
    new_model = gmm_ops.add_component(model, init_weight, new_mean, new_cov)
    new_meta = meta_ops.add_component_meta(
        meta, slot, has_room, init_weight, threshold, des_entropy
    )
    return new_model, new_meta, adapt, db


def adapt_number_of_components(
    model: GmmState,
    meta: MetaState,
    adapt: AdaptationState,
    db: SampleDbState,
    cfg: VipsConfig,
    iteration: jnp.ndarray,
    key: jnp.ndarray,
    prior_samples: Optional[jnp.ndarray] = None,
    prior_lnpdfs: Optional[jnp.ndarray] = None,
):
    """Top-level adaptation gate (component_adaptation.py:177-190): delete
    check once ``iteration > del_iters``; add every ``add_iters`` iterations
    while below ``max_components``."""

    def do_delete(args):
        model, meta = args
        return delete_bad_components(model, meta, cfg)

    model, meta = jax.lax.cond(
        iteration > cfg.del_iters, do_delete, lambda a: a, (model, meta)
    )

    should_add = (
        (iteration > 1)
        & (iteration % cfg.add_iters == 0)
        & (model.num_active < cfg.max_components)
        & (model.num_active < model.max_components)
    )

    def do_add(args):
        model, meta, adapt, db = args
        return add_new_component(
            model, meta, adapt, db, cfg, key, prior_samples, prior_lnpdfs
        )

    model, meta, adapt, db = jax.lax.cond(
        should_add, do_add, lambda a: a, (model, meta, adapt, db)
    )
    return model, meta, adapt, db
