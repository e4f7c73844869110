"""Sample selection: VIPS (component-based) and Lin (mixture-based).

(reference: src/gmmvi/optimization/gmmvi_modules/sample_selector.py)

Two-pass procedure with static shapes:

1. Query the newest ``reused_per_comp * K`` samples from the DB and compute
   effective sample sizes from normalized importance weights (per component for
   VIPS, for the whole mixture for Lin).
2. Draw the missing ``max(1, n_des - n_eff)`` fresh samples — here always a
   full ``[Kmax, n_des]`` (VIPS) / ``[n_des]`` (Lin) batch with a validity
   mask, so the compiled program has one shape; only valid samples count as
   function evaluations or contribute to estimates.

The split into :func:`propose` / :func:`finalize` mirrors the reference's
graph-compilation boundary (sample_selector.py:35-36, gmmvi.py:89-103): the
target density evaluation happens between the two calls, either inside the same
jit (jit-safe targets) or on the host (escape hatch for non-JAX targets).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gmmvi_tpu.models import gmm as gmm_ops
from gmmvi_tpu.models.gmm import GmmState
from gmmvi_tpu.optimization import sample_db as db_ops
from gmmvi_tpu.optimization.sample_db import SampleDbState, SampleWindow
from gmmvi_tpu.ops.stable import masked_logsumexp


class SelectorConfig(NamedTuple):
    """Static selector hyperparameters (sample_selector.py:132-138, 251-256)."""

    kind: str                        # "component-based" | "mixture-based"
    desired_samples_per_component: int
    reused_samples_per_component: int  # floor(ratio * n_des)
    max_background_dists: int

    @property
    def is_vips(self) -> bool:
        return self.kind == "component-based"


class Proposal(NamedTuple):
    """Fresh samples awaiting target evaluation."""

    samples: jnp.ndarray   # [B, D] flat
    valid: jnp.ndarray     # [B]
    mapping: jnp.ndarray   # [B] generating component
    num_reused: jnp.ndarray  # scalar int32: valid count of the pass-1 window


def _effective_samples(log_densities, background, valid):
    """ESS from self-normalized importance weights: 1 / sum w^2
    (reference: sample_selector.py:140-158).  ``log_densities`` is
    ``[K, W]`` (per component) or ``[1, W]`` (mixture)."""
    log_w = log_densities - background[None, :]
    mask = jnp.broadcast_to(valid[None, :], log_w.shape)
    log_w = log_w - masked_logsumexp(log_w, mask=mask, axis=1, keepdims=True)
    w = jnp.where(mask, jnp.exp(log_w), 0.0)
    denom = jnp.sum(jnp.square(w), axis=1)
    n_eff = jnp.where(denom > 0, 1.0 / jnp.maximum(denom, 1e-38), 0.0)
    return jnp.floor(n_eff).astype(jnp.int32)


def reuse_window_size(cfg: SelectorConfig, max_components: int) -> int:
    return cfg.reused_samples_per_component * max_components


def total_window_size(cfg: SelectorConfig, max_components: int) -> int:
    if cfg.is_vips:
        fresh = max_components * cfg.desired_samples_per_component
    else:
        fresh = cfg.desired_samples_per_component
    return reuse_window_size(cfg, max_components) + fresh


def propose(
    model: GmmState,
    db: SampleDbState,
    cfg: SelectorConfig,
    key: jnp.ndarray,
    shard_fn=None,
) -> Proposal:
    """Pass 1 + fresh-sample draw (reference: sample_selector.py:160-211 /
    279-325).

    ``shard_fn`` (data-parallel runs) pins the reuse window and the ESS
    density pass to the mesh's sample axis, keeping the ``[K, W]`` pass-1
    computation shardwise (see :func:`gmmvi_tpu.models.gmm.density_pack`)."""
    kmax = model.max_components
    n_des = cfg.desired_samples_per_component
    w_reuse = reuse_window_size(cfg, kmax)
    n_requested = cfg.reused_samples_per_component * model.num_active

    if w_reuse > 0:
        win = db_ops.get_newest_samples(
            db, w_reuse, n_requested, cfg.max_background_dists,
            shard_fn=shard_fn,
        )
        num_reused = win.num_valid
    else:
        win = None
        num_reused = jnp.asarray(0, jnp.int32)

    if cfg.is_vips:
        if win is not None:
            comp_ld = gmm_ops.component_log_densities_fast(
                model, win.samples, shard_fn=shard_fn)
            n_eff = _effective_samples(
                comp_ld, win.background_log_pdfs, win.valid
            )
            n_eff = jnp.where(win.num_valid > 0, n_eff, 0)
        else:
            n_eff = jnp.zeros((kmax,), jnp.int32)
        counts = jnp.maximum(1, n_des - n_eff)          # [Kmax]
        counts = jnp.where(model.mask, counts, 0)
        fresh = gmm_ops.sample_from_components(model, key, n_des)  # [Kmax, n, D]
        col = jnp.arange(n_des)[None, :]
        valid = jnp.logical_and(col < counts[:, None], model.mask[:, None])
        mapping = jnp.broadcast_to(
            jnp.arange(kmax, dtype=jnp.int32)[:, None], (kmax, n_des)
        )
        return Proposal(
            samples=fresh.reshape(-1, model.num_dimensions),
            valid=valid.reshape(-1),
            mapping=mapping.reshape(-1),
            num_reused=num_reused,
        )

    # mixture-based (Lin): scalar mixture ESS, fresh draws from the mixture
    if win is not None:
        model_ld = gmm_ops.log_density(model, win.samples)
        n_eff = _effective_samples(
            model_ld[None, :], win.background_log_pdfs, win.valid
        )[0]
        n_eff = jnp.where(win.num_valid > 0, n_eff, 0)
    else:
        n_eff = jnp.asarray(0, jnp.int32)
    count = jnp.maximum(1, n_des - n_eff)

    cat_key, eps_key = jax.random.split(key)
    mapping = gmm_ops.sample_categorical(model, cat_key, n_des)
    eps = jax.random.normal(eps_key, (n_des, model.num_dimensions))
    mu = model.means[mapping]
    if model.diagonal:
        fresh = mu + model.chols[mapping] * eps
    else:
        fresh = mu + jnp.einsum(
            "nij,nj->ni", model.chols[mapping], eps,
            precision=jax.lax.Precision.HIGHEST,
        )
    valid = jnp.arange(n_des) < count
    return Proposal(
        samples=fresh, valid=valid, mapping=mapping.astype(jnp.int32),
        num_reused=num_reused,
    )


def finalize(
    model: GmmState,
    db: SampleDbState,
    cfg: SelectorConfig,
    iteration: jnp.ndarray,
    proposal: Proposal,
    target_lnpdfs: jnp.ndarray,
    target_grads: jnp.ndarray,
    key: jnp.ndarray,
) -> Tuple[SampleDbState, SampleWindow]:
    """Pass 2: store evaluated fresh samples, re-query the combined window so
    the background densities include them
    (reference: sample_selector.py:204-219 / 327-339)."""
    db, win, _ = finalize_fused(
        model, db, cfg, iteration, proposal, target_lnpdfs, target_grads, key
    )
    return db, win


def finalize_fused(
    model: GmmState,
    db: SampleDbState,
    cfg: SelectorConfig,
    iteration: jnp.ndarray,
    proposal: Proposal,
    target_lnpdfs: jnp.ndarray,
    target_grads: jnp.ndarray,
    key: jnp.ndarray,
    shard_fn=None,
):
    """Like :func:`finalize`, but also returns the current-model
    :class:`~gmmvi_tpu.models.gmm.DensityPack` over the window — the single
    fused density pass shared between the background mixture and the
    natural-gradient estimator (one pass per step instead of three).
    ``shard_fn`` constrains the window to the data-parallel mesh before the
    density passes (see :func:`sample_db.get_newest_samples_fused`)."""
    db = db_ops.add_samples(
        db, iteration, model,
        proposal.samples, proposal.valid, proposal.mapping,
        target_lnpdfs, target_grads, key,
        shard_fn=shard_fn,
    )
    n_new = jnp.sum(proposal.valid.astype(jnp.int32))
    w_total = total_window_size(cfg, model.max_components)
    win, pack = db_ops.get_newest_samples_fused(
        db, w_total, proposal.num_reused + n_new, cfg.max_background_dists,
        model, iteration,
        any_old_dists=cfg.reused_samples_per_component > 0,
        shard_fn=shard_fn,
    )
    return db, win, pack
