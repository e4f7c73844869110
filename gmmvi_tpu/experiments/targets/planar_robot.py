"""Planar robot inverse-kinematics target.

(reference: src/gmmvi/experiments/target_distributions/planar_robot.py)

10-link planar arm; prior N(0, diag(1, 0.2^2, ...)); likelihood = max over
goal Gaussians (sigma = 1e-2) of the end-effector position density.  The
forward kinematics is a cumulative-sum + sin/cos reduction — fully vectorized
(the reference loops over links, planar_robot.py:57-63).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.experiments.targets.lnpdf import LNPDF

LOG_2PI = math.log(2.0 * math.pi)


class PlanarRobot(LNPDF):
    """(reference: planar_robot.py:13-66)"""

    def __init__(self, num_links: int, num_goals: int,
                 prior_std: float = 2e-1, likelihood_std: float = 1e-2):
        super().__init__(use_log_density_and_grad=False, safe_for_jit=True)
        self._num_dimensions = num_links
        prior_stds = prior_std * np.ones(num_links, np.float32)
        prior_stds[0] = 1.0
        self.prior_stds = jnp.asarray(prior_stds)
        self.link_lengths = jnp.ones(num_links, jnp.float32)
        self._num_goals = num_goals
        if num_goals == 1:
            goals = [[7.0, 0.0]]
        elif num_goals == 4:
            goals = [[7.0, 0.0], [-7.0, 0.0], [0.0, 7.0], [0.0, -7.0]]
        else:
            raise ValueError("num_goals must be 1 or 4")
        self.goals = jnp.asarray(goals, jnp.float32)
        self.likelihood_std = float(likelihood_std)

    def get_num_dimensions(self):
        return self._num_dimensions

    def forward_kinematics(self, theta):
        """End-effector [N, 2] positions via cumulative joint angles."""
        angles = jnp.cumsum(theta, axis=1)                 # [N, L]
        x = jnp.sum(self.link_lengths * jnp.cos(angles), axis=1)
        y = jnp.sum(self.link_lengths * jnp.sin(angles), axis=1)
        return jnp.stack((x, y), axis=1)

    def _log_prior(self, theta):
        return jnp.sum(
            -jnp.log(self.prior_stds)
            - 0.5 * LOG_2PI
            - 0.5 * jnp.square(theta / self.prior_stds),
            axis=1,
        )

    def likelihood(self, pos):
        """max over goals of log N(pos; goal, sigma^2 I)
        (reference: planar_robot.py:48-52)."""
        s = self.likelihood_std
        d2 = jnp.sum(
            jnp.square(pos[:, None, :] - self.goals[None, :, :]), axis=2
        )
        log_probs = -LOG_2PI - 2.0 * math.log(s) - 0.5 * d2 / (s * s)
        return jnp.max(log_probs, axis=1)

    def log_density(self, theta):
        theta = jnp.asarray(theta, jnp.float32)
        return self._log_prior(theta) + self.likelihood(
            self.forward_kinematics(theta)
        )

    def expensive_metrics(self, model_state, samples) -> dict:
        """Mode count per goal: cluster the first joint angle of components
        whose mean reaches the goal (reference: planar_robot.py:68-126)."""
        active = int(model_state.num_active)
        means = np.asarray(model_state.means[:active])
        metrics = {}
        pos = np.asarray(self.forward_kinematics(jnp.asarray(means)))
        good = np.asarray(self.log_density(jnp.asarray(means))) > -7.0
        for g in np.asarray(self.goals):
            err = np.linalg.norm(pos - g, axis=1)
            sel = (err < 0.05) & good
            first_links = np.sort(means[sel, 0])
            if first_links.size == 0:
                n_modes = 0
            else:
                gaps = np.diff(first_links)
                n_modes = 1 + int(np.sum(gaps > 0.4))
            metrics[f"num_detected_modes_[{g[0]}, {g[1]}]"] = n_modes

        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from gmmvi_tpu.experiments.evaluation.visualize_planar_robot import (
                visualize_mixture,
            )

            fig = plt.figure()
            weights = np.asarray(model_state.weights[:active])
            visualize_mixture(weights, means, goals=np.asarray(self.goals),
                              ax=fig.gca())
            fig.tight_layout()
            metrics["mixture_plot"] = fig
        except Exception:  # matplotlib unavailable: metrics only
            pass
        return metrics


def make_single_goal() -> PlanarRobot:
    return PlanarRobot(10, 1)


def make_four_goal() -> PlanarRobot:
    return PlanarRobot(10, 4)
