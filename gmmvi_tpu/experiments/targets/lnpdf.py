"""Target distribution interface.

(reference: src/gmmvi/experiments/target_distributions/lnpdf.py)

``safe_for_jit`` mirrors the reference's ``safe_for_tf_graph``: when True, the
whole training iteration (including target evaluation) compiles into a single
XLA program; when False, only the update phase is compiled and target
evaluation runs eagerly on the host between the jitted propose/update phases
(reference: gmmvi.py:89-103).  ``use_log_density_and_grad`` marks targets that
supply their own gradients because autodiff through ``log_density`` is not
possible (reference: lnpdf.py:27-29).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


class LNPDF:
    """Unnormalized target log-density interface (reference: lnpdf.py:6-127)."""

    def __init__(self, use_log_density_and_grad: bool = False,
                 safe_for_jit: bool = True):
        self._use_log_density_and_grad = use_log_density_and_grad
        self._safe_for_jit = safe_for_jit

    # -- required -----------------------------------------------------------
    def log_density(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def get_num_dimensions(self) -> int:
        raise NotImplementedError

    # -- optional -----------------------------------------------------------
    def log_density_and_grad(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Default: autodiff through :meth:`log_density`
        (reference: sample_selector.py:69-78)."""
        ld, grads = jax.vmap(
            jax.value_and_grad(lambda s: self.log_density(s[None])[0])
        )(x)
        return ld, grads

    def expensive_metrics(self, model_state, samples: jnp.ndarray) -> dict:
        """Task-specific metrics for the runner (reference: lnpdf.py:69-83)."""
        return {}

    def can_sample(self) -> bool:
        return False

    def sample(self, key, n: int) -> jnp.ndarray:
        raise NotImplementedError

    # -- flags --------------------------------------------------------------
    @property
    def use_log_density_and_grad(self) -> bool:
        return self._use_log_density_and_grad

    @property
    def safe_for_jit(self) -> bool:
        return self._safe_for_jit

    # alias for parity with reference configs/code
    @property
    def safe_for_tf_graph(self) -> bool:
        return self._safe_for_jit
