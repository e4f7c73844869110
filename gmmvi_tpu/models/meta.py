"""Per-component optimizer meta-state (the reference's ``GmmWrapper``).

Statically-shaped pytree companion to :class:`~gmmvi_tpu.models.gmm.GmmState`,
holding the learner's per-component bookkeeping
(reference: src/gmmvi/models/gmm_wrapper.py:60-81).  Add/remove keep the meta
arrays in sync with the model via the same slot-write / compaction-gather
scheme (reference: gmm_wrapper.py:90-148).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from gmmvi_tpu.models import gmm as gmm_ops
from gmmvi_tpu.models.gmm import GmmState

F32_MIN = jnp.finfo(jnp.float32).min


@struct.dataclass
class MetaState:
    """Per-component learner state, padded to ``[Kmax]`` / ``[Kmax, H]``.

    ``reward_history`` / ``weight_history`` are rolling windows, newest entry
    last (reference: gmm_wrapper.py:150-158 shifts left on store).
    """

    l2_regularizers: jnp.ndarray       # [Kmax]
    last_etas: jnp.ndarray             # [Kmax]; -1 = no warmstart (gmm_wrapper.py:64)
    num_received_updates: jnp.ndarray  # [Kmax] float, as in reference
    stepsizes: jnp.ndarray             # [Kmax]
    reward_history: jnp.ndarray        # [Kmax, H], init F32_MIN
    weight_history: jnp.ndarray        # [Kmax, H], init F32_MIN
    unique_component_ids: jnp.ndarray  # [Kmax] int32
    max_component_id: jnp.ndarray      # scalar int32
    adding_thresholds: jnp.ndarray     # [Kmax]
    initial_entropies: jnp.ndarray     # [Kmax]
    initial_stepsize: float = struct.field(pytree_node=False, default=1.0)
    initial_regularizer: float = struct.field(pytree_node=False, default=1e-12)

    @property
    def max_components(self) -> int:
        return self.stepsizes.shape[0]

    @property
    def history_length(self) -> int:
        return self.reward_history.shape[1]


def create_meta_state(
    model: GmmState,
    initial_stepsize: float,
    initial_regularizer: float,
    max_reward_history_length: int,
) -> MetaState:
    """(reference: gmm_wrapper.py:60-81)"""
    kmax = model.max_components
    h = max_reward_history_length
    return MetaState(
        l2_regularizers=jnp.full((kmax,), initial_regularizer, jnp.float32),
        last_etas=jnp.full((kmax,), -1.0, jnp.float32),
        num_received_updates=jnp.zeros((kmax,), jnp.float32),
        stepsizes=jnp.full((kmax,), initial_stepsize, jnp.float32),
        reward_history=jnp.full((kmax, h), F32_MIN, jnp.float32),
        weight_history=jnp.full((kmax, h), F32_MIN, jnp.float32),
        unique_component_ids=jnp.arange(kmax, dtype=jnp.int32),
        max_component_id=jnp.asarray(kmax - 1, jnp.int32),
        adding_thresholds=jnp.full((kmax,), -1.0, jnp.float32),
        initial_entropies=gmm_ops.component_entropies(model),
        initial_stepsize=float(initial_stepsize),
        initial_regularizer=float(initial_regularizer),
    )


def history_length_from_config(config: dict) -> int:
    """2 * max(2, del_iters) when VIPS adaptation is configured, else 2
    (reference: gmm_wrapper.py:53-54)."""
    adapter_cfg = config.get("num_component_adapter_config", {}) or {}
    if "del_iters" in adapter_cfg:
        return 2 * max(2, int(adapter_cfg["del_iters"]))
    return 2


def store_rewards(meta: MetaState, rewards: jnp.ndarray) -> MetaState:
    """Shift reward history left, append newest (reference: gmm_wrapper.py:150-158)."""
    hist = jnp.concatenate([meta.reward_history[:, 1:], rewards[:, None]], axis=1)
    return meta.replace(reward_history=hist)


def store_weights(meta: MetaState, weights: jnp.ndarray) -> MetaState:
    """Shift weight history left, append current weights
    (reference: gmm_wrapper.py:170-182)."""
    hist = jnp.concatenate([meta.weight_history[:, 1:], weights[:, None]], axis=1)
    return meta.replace(weight_history=hist)


def add_component_meta(
    meta: MetaState,
    slot: jnp.ndarray,
    has_room: jnp.ndarray,
    initial_weight: jnp.ndarray,
    adding_threshold: jnp.ndarray,
    initial_entropy: jnp.ndarray,
) -> MetaState:
    """Initialize meta-state for a newly added component at ``slot``
    (reference: gmm_wrapper.py:90-127: reward row = float32.min, weight row =
    raw initial weight, fresh unique id)."""

    def setrow(arr, value):
        return arr.at[slot].set(jnp.where(has_room, value, arr[slot]))

    new_id = meta.max_component_id + 1
    h = meta.history_length
    return meta.replace(
        l2_regularizers=setrow(meta.l2_regularizers, meta.initial_regularizer),
        last_etas=setrow(meta.last_etas, -1.0),
        num_received_updates=setrow(meta.num_received_updates, 0.0),
        stepsizes=setrow(meta.stepsizes, meta.initial_stepsize),
        reward_history=meta.reward_history.at[slot].set(
            jnp.where(has_room, jnp.full((h,), F32_MIN), meta.reward_history[slot])
        ),
        weight_history=meta.weight_history.at[slot].set(
            jnp.where(
                has_room,
                jnp.full((h,), initial_weight, jnp.float32),
                meta.weight_history[slot],
            )
        ),
        unique_component_ids=meta.unique_component_ids.at[slot].set(
            jnp.where(has_room, new_id, meta.unique_component_ids[slot]).astype(jnp.int32)
        ),
        max_component_id=jnp.where(has_room, new_id, meta.max_component_id).astype(
            jnp.int32
        ),
        adding_thresholds=setrow(meta.adding_thresholds, adding_threshold),
        initial_entropies=setrow(meta.initial_entropies, initial_entropy),
    )


def remove_components_meta(meta: MetaState, order: jnp.ndarray) -> MetaState:
    """Apply the same compaction permutation used on the model
    (reference: gmm_wrapper.py:129-148)."""
    return meta.replace(
        l2_regularizers=meta.l2_regularizers[order],
        last_etas=meta.last_etas[order],
        num_received_updates=meta.num_received_updates[order],
        stepsizes=meta.stepsizes[order],
        reward_history=meta.reward_history[order],
        weight_history=meta.weight_history[order],
        unique_component_ids=meta.unique_component_ids[order],
        adding_thresholds=meta.adding_thresholds[order],
        initial_entropies=meta.initial_entropies[order],
    )


def repad_meta(meta: MetaState, new_max_components: int) -> MetaState:
    """Grow the padded capacity (host-side; companion of
    :func:`gmmvi_tpu.models.gmm.repad`).  New slots carry the same init
    values :func:`create_meta_state` uses; ids are assigned on add."""
    kmax, h = meta.max_components, meta.history_length
    extra = new_max_components - kmax
    if extra <= 0:
        return meta

    def pad1(arr, value, dtype=jnp.float32):
        return jnp.concatenate([arr, jnp.full((extra,), value, dtype)])

    return meta.replace(
        l2_regularizers=pad1(meta.l2_regularizers, meta.initial_regularizer),
        last_etas=pad1(meta.last_etas, -1.0),
        num_received_updates=pad1(meta.num_received_updates, 0.0),
        stepsizes=pad1(meta.stepsizes, meta.initial_stepsize),
        reward_history=jnp.concatenate(
            [meta.reward_history, jnp.full((extra, h), F32_MIN, jnp.float32)]
        ),
        weight_history=jnp.concatenate(
            [meta.weight_history, jnp.full((extra, h), F32_MIN, jnp.float32)]
        ),
        unique_component_ids=pad1(meta.unique_component_ids, -1, jnp.int32),
        adding_thresholds=pad1(meta.adding_thresholds, -1.0),
        initial_entropies=pad1(meta.initial_entropies, 0.0),
    )
