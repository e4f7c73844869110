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


class Talos(LNPDF):
    """34-DoF Talos humanoid inverse-kinematics posterior
    (reference: talos_ik.py:16-188).

    The unnormalized density is a mixture-of-experts reward over a sample
    ``x = [q (28 joints), base position (3), base roll-pitch-yaw (3)]``
    (reference ``param_to_joint_pos``, talos_ik.py:196-199):

    - soft-uniform joint-limit prior over the 28 actuated joints
      (std 0.05, talos_ik.py:97-111),
    - soft-uniform support constraint on CoM-to-left-foot xy offset
      (|.| < 0.14, std 0.01, talos_ik.py:127-140),
    - Gaussian pose rewards for both feet (12-dim [pos, rotation] targets,
      std [0.02]*3 + [0.1]*9, talos_ik.py:117-125),
    - Gaussian position reward for the left gripper at ``context``
      (std 0.02, talos_ik.py:113-115).

    The reference must evaluate this target *eagerly*
    (``safe_for_tf_graph=False``, talos_ik.py:31) because its kinematics
    stack is an external library.  Here the forward kinematics is a
    from-scratch JAX implementation parsed offline from the bundled URDF
    (:mod:`gmmvi_tpu.experiments.targets.urdf`), so the whole target —
    including its gradient — compiles into the training step.
    """

    JOINT_LIMITS_STD = 0.05       # talos_ik.py:99
    COM_LIMIT = 0.14              # talos_ik.py:128
    COM_STD = 0.01                # talos_ik.py:129
    GRIPPER_STD = 0.02            # talos_ik.py:115
    FOOT_STD = [0.02] * 3 + [0.1] * 9   # talos_ik.py:119
    LEFT_FOOT_TARGET = [-0.02, 0.09, -0.0,
                        1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    RIGHT_FOOT_TARGET = [-0.02, -0.09, -0.0,
                         1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]

    def __init__(self, context):
        super().__init__(use_log_density_and_grad=False, safe_for_jit=True)
        from pathlib import Path

        from gmmvi_tpu.experiments.targets.urdf import KinematicTree

        urdf_path = str(
            Path(__file__).parent / "datasets" / "talos_reduced.urdf"
        )
        # same root and tip frames as the reference (talos_ik.py:56-66)
        self.tree = KinematicTree(urdf_path, root="base_link", tips={
            "r_gripper": "gripper_right_base_link",
            "l_gripper": "gripper_left_base_link",
            "r_foot": "right_sole_link",
            "l_foot": "left_sole_link",
        })
        assert self.tree.nb_joint == 28, self.tree.nb_joint
        self._dims = self.tree.nb_joint + 6
        self.context = jnp.asarray(np.asarray(context, np.float32))
        # neutral configuration: limit midpoints + standing base height
        # (talos_ik.py:41)
        self.mean_joints = np.concatenate([
            self.tree.mean_pose, [0.0, 0.0, 1.08, 0.0, 0.0, 0.0]
        ]).astype(np.float32)
        self._limits = jnp.asarray(self.tree.joint_limits)
        self._foot_std = jnp.asarray(np.asarray(self.FOOT_STD, np.float32))
        self._l_foot_t = jnp.asarray(
            np.asarray(self.LEFT_FOOT_TARGET, np.float32))
        self._r_foot_t = jnp.asarray(
            np.asarray(self.RIGHT_FOOT_TARGET, np.float32))

    def get_num_dimensions(self) -> int:
        return self._dims

    @staticmethod
    def _soft_uniform_log_prob(x, low, high, std, temp=1.0):
        """Product of two normal CDFs: ~0 inside [low, high], smoothly
        decaying outside (the reference's ``SoftUniformNormalCdf`` expert,
        talos_ik.py:101-108); summed over the trailing axis."""
        from jax.scipy.stats import norm

        lp = norm.logcdf((x - low) / std) + norm.logcdf((high - x) / std)
        return temp * jnp.sum(lp, axis=-1)

    @staticmethod
    def _diag_normal_log_prob(x, mean, std):
        """MVN-diag log-density (normalized, like tfp's MultivariateNormalDiag)."""
        z = (x - mean) / std
        return -0.5 * jnp.sum(z * z, axis=-1) - jnp.sum(jnp.log(std)) \
            - 0.5 * x.shape[-1] * jnp.log(2.0 * jnp.pi).astype(x.dtype)

    def log_density(self, x: jnp.ndarray) -> jnp.ndarray:
        """Sum of the five expert rewards (reference ``_reward``,
        talos_ik.py:142-149)."""
        from gmmvi_tpu.experiments.targets.urdf import rpy_matrix_batched

        q = x[:, : self.tree.nb_joint]
        base_pos = x[:, self.tree.nb_joint: self.tree.nb_joint + 3]
        base_rot = rpy_matrix_batched(x[:, -3:])
        positions, rotations = self.tree.fk(q, base_pos, base_rot)

        rew = self._soft_uniform_log_prob(
            q, self._limits[:, 0], self._limits[:, 1], self.JOINT_LIMITS_STD
        )
        com_xy = self.tree.com(positions, rotations)[:, :2]
        l_foot = self.tree.tip_pose(positions, rotations, "l_foot")
        r_foot = self.tree.tip_pose(positions, rotations, "r_foot")
        l_gripper = self.tree.tip_pose(positions, rotations, "l_gripper")
        rew += self._soft_uniform_log_prob(
            com_xy - l_foot[:, :2], -self.COM_LIMIT, self.COM_LIMIT,
            self.COM_STD,
        )
        rew += self._diag_normal_log_prob(r_foot, self._r_foot_t, self._foot_std)
        rew += self._diag_normal_log_prob(l_foot, self._l_foot_t, self._foot_std)
        rew += self._diag_normal_log_prob(
            l_gripper[:, :3], self.context, self.GRIPPER_STD
        )
        return rew

    def expensive_metrics(self, model_state, samples: jnp.ndarray) -> dict:
        """Stick-figure renders of up to 100 sampled configurations on the
        (x, z) and (y, z) planes (reference: talos_ik.py:154-188)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return {}
        from gmmvi_tpu.experiments.targets.urdf import rpy_matrix_batched

        x = jnp.asarray(samples[:100])
        q = x[:, : self.tree.nb_joint]
        base_pos = x[:, self.tree.nb_joint: self.tree.nb_joint + 3]
        base_rot = rpy_matrix_batched(x[:, -3:])
        positions, rotations = self.tree.fk(q, base_pos, base_rot)
        coms = np.asarray(self.tree.com(positions, rotations))
        pos = np.asarray(positions)  # [B, S+1, 3]

        parents = [s.parent_idx for s in self.tree.segments]
        ctx = np.asarray(self.context)
        fig, ax = plt.subplots(ncols=2, sharex=True, figsize=(15, 10))
        for i, dim in enumerate(([0, 2], [1, 2])):
            for b in range(pos.shape[0]):
                for child, par in enumerate(parents, start=1):
                    ax[i].plot(
                        [pos[b, par, dim[0]], pos[b, child, dim[0]]],
                        [pos[b, par, dim[1]], pos[b, child, dim[1]]],
                        color="k", alpha=0.2,
                    )
            ax[i].plot(coms[:, dim[0]], coms[:, dim[1]], "yx")
            ax[i].plot(self.LEFT_FOOT_TARGET[dim[0]],
                       self.LEFT_FOOT_TARGET[dim[1]], ls=" ", marker="s",
                       label="left_foot_target", color="red")
            ax[i].plot(self.RIGHT_FOOT_TARGET[dim[0]],
                       self.RIGHT_FOOT_TARGET[dim[1]], ls=" ", marker="s",
                       label="right_foot_target", color="green")
            ax[i].plot(ctx[dim[0]], ctx[dim[1]], ls=" ", marker="o",
                       markersize=6, label="left_gripper_target",
                       color="orange")
            ax[i].legend()
        return {"plot": fig}


class TalosLeftGripperTargetPdf:
    """Prior over reachable left-gripper targets in spherical coordinates
    (reference: talos_ik.py:202-217) — used to sample IK contexts."""

    def __init__(self):
        self.radius_low, self.radius_high = 0.2, 1.0
        self.xy_low, self.xy_high = -np.pi / 2, np.pi / 2
        self.z_low = float(np.deg2rad(10))
        # faithful to the reference, including its rad2deg quirk
        # (talos_ik.py:207)
        self.z_high = float(np.rad2deg(170))

    def sample(self, key, n: int) -> jnp.ndarray:
        import jax

        k1, k2, k3 = jax.random.split(key, 3)
        xy_ang = jax.random.uniform(k1, (n,), minval=self.xy_low,
                                    maxval=self.xy_high)
        rad = jax.random.uniform(k2, (n,), minval=self.radius_low,
                                 maxval=self.radius_high)
        z_ang = jax.random.uniform(k3, (n,), minval=self.z_low,
                                   maxval=self.z_high)
        x = rad * jnp.sin(z_ang) * jnp.cos(xy_ang)
        y = rad * jnp.sin(z_ang) * jnp.sin(xy_ang)
        z = rad * jnp.cos(z_ang)
        return jnp.stack([x, y, z], axis=-1)


def make_talos_target(context):
    """34-DoF Talos IK posterior (reference: talos_ik.py:220-231).

    ``context`` is the desired (x, y, z) of the left end-effector.  Fully
    JAX-native (jit-safe); for targets backed by *external* robotics stacks,
    wrap them with :class:`HostLNPDF` instead."""
    return Talos(context)
