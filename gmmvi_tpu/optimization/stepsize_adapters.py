"""Stepsize adaptation for component updates and the weight update.

(reference: src/gmmvi/optimization/gmmvi_modules/component_stepsize_adaptation.py
 and weight_stepsize_adaptation.py)

All component adapters are vectorized over the padded component axis (the
reference loops per component); the weight adapters carry their scalar state
in a small pytree.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from gmmvi_tpu.models.gmm import GmmState
from gmmvi_tpu.models.meta import MetaState

F32_MIN = jnp.finfo(jnp.float32).min


# ---------------------------------------------------------------------------
# Component stepsizes (reference: component_stepsize_adaptation.py)
# ---------------------------------------------------------------------------

def fixed_component_stepsize(meta: MetaState, config: dict) -> jnp.ndarray:
    """(reference: component_stepsize_adaptation.py:69-92)"""
    return meta.stepsizes


def decaying_component_stepsize(meta: MetaState, config: dict) -> jnp.ndarray:
    """s0 / (1 + n_updates^exponent) per component
    (reference: component_stepsize_adaptation.py:95-130)."""
    s0 = config["initial_stepsize"]
    exp = config["annealing_exponent"]
    return s0 / (1.0 + jnp.power(meta.num_received_updates, exp))


def improvement_based_component_stepsize(meta: MetaState, config: dict) -> jnp.ndarray:
    """Increase per-component stepsize when its reward improved, else decrease
    (reference: component_stepsize_adaptation.py:133-188)."""
    improved = meta.reward_history[:, -1] > meta.reward_history[:, -2]
    inc = jnp.minimum(
        config["stepsize_inc_factor"] * meta.stepsizes, config["max_stepsize"]
    )
    dec = jnp.maximum(
        config["stepsize_dec_factor"] * meta.stepsizes, config["min_stepsize"]
    )
    return jnp.where(improved, inc, dec)


COMPONENT_STEPSIZE_ADAPTERS = {
    "fixed": fixed_component_stepsize,
    "decaying": decaying_component_stepsize,
    "improvement-based": improvement_based_component_stepsize,
}


# ---------------------------------------------------------------------------
# Weight stepsize (reference: weight_stepsize_adaptation.py)
# ---------------------------------------------------------------------------

@struct.dataclass
class WeightStepsizeState:
    stepsize: jnp.ndarray            # scalar
    num_updates: jnp.ndarray         # scalar (decaying)
    prev_elbo: jnp.ndarray           # scalar (improvement-based)


def create_weight_stepsize_state(initial_stepsize: float) -> WeightStepsizeState:
    return WeightStepsizeState(
        stepsize=jnp.asarray(initial_stepsize, jnp.float32),
        num_updates=jnp.asarray(0.0, jnp.float32),
        prev_elbo=jnp.asarray(F32_MIN, jnp.float32),
    )


def fixed_weight_stepsize(
    state: WeightStepsizeState, model: GmmState, meta: MetaState, config: dict
) -> WeightStepsizeState:
    """(reference: weight_stepsize_adaptation.py:64-72)"""
    return state


def decaying_weight_stepsize(
    state: WeightStepsizeState, model: GmmState, meta: MetaState, config: dict
) -> WeightStepsizeState:
    """s0 / (1 + n^exponent) (reference: weight_stepsize_adaptation.py:75-105)."""
    s0 = config["initial_stepsize"]
    exp = config["annealing_exponent"]
    new = s0 / (1.0 + jnp.power(state.num_updates, exp))
    return state.replace(stepsize=new, num_updates=state.num_updates + 1.0)


def improvement_based_weight_stepsize(
    state: WeightStepsizeState, model: GmmState, meta: MetaState, config: dict
) -> WeightStepsizeState:
    """Track an ELBO estimate sum_o w_o R_o - sum_o w_o log w_o; increase the
    stepsize when it improved (reference: weight_stepsize_adaptation.py:108-156)."""
    w = model.weights
    elbo = jnp.sum(w * jnp.where(model.mask, meta.reward_history[:, -1], 0.0)) \
        - jnp.sum(jnp.where(model.mask, w * model.log_weights, 0.0))
    improved = elbo > state.prev_elbo
    inc = jnp.minimum(config["stepsize_inc_factor"] * state.stepsize,
                      config["max_stepsize"])
    dec = jnp.maximum(config["stepsize_dec_factor"] * state.stepsize,
                      config["min_stepsize"])
    return state.replace(
        stepsize=jnp.where(improved, inc, dec), prev_elbo=elbo
    )


WEIGHT_STEPSIZE_ADAPTERS = {
    "fixed": fixed_weight_stepsize,
    "decaying": decaying_weight_stepsize,
    # the reference uses underscore here, hyphen for the component adapter —
    # keep the quirk for config parity (weight_stepsize_adaptation.py:43)
    "improvement_based": improvement_based_weight_stepsize,
}
