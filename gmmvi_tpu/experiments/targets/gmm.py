"""GMM target distributions (full and diagonal covariance).

(reference: src/gmmvi/experiments/target_distributions/gmm.py and diag_gmm.py)
Implemented directly on the framework's batched mixture ops instead of
tensorflow-probability distributions.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.experiments.targets.lnpdf import LNPDF
from gmmvi_tpu.models import gmm as gmm_ops
from gmmvi_tpu.models.gmm import create_gmm_state


class GMM_LNPDF(LNPDF):
    """Target given by a (full-covariance) GMM (reference: gmm.py:12-120)."""

    def __init__(self, target_weights, target_means, target_covs,
                 diagonal=False, make_plots=True):
        super().__init__(use_log_density_and_grad=True, safe_for_jit=True)
        self.target_weights = np.asarray(target_weights, np.float32)
        self.target_means = np.asarray(target_means, np.float32)
        self.target_covs = np.asarray(target_covs, np.float32)
        self.make_plots = make_plots
        self._state = create_gmm_state(
            self.target_weights, self.target_means, self.target_covs,
            diagonal=diagonal,
        )

    def log_density(self, x):
        return gmm_ops.log_density(self._state, jnp.asarray(x, jnp.float32))

    def log_density_and_grad(self, x):
        """Analytic mixture gradient (one forward pass, no per-sample AD —
        the reference differentiates with a GradientTape)."""
        ld, grads, _ = gmm_ops.log_density_and_grad(
            self._state, jnp.asarray(x, jnp.float32))
        return ld, grads

    def marginal_log_density(self, x, dim):
        return gmm_ops.marginal_log_density(self._state, jnp.asarray(x), dim)

    def get_num_dimensions(self):
        return self.target_means.shape[1]

    def can_sample(self):
        return True

    def sample(self, key, n):
        return gmm_ops.sample(self._state, key, n)[0]

    def expensive_metrics(self, model_state, samples) -> dict:
        """Mode-recovery count: modes whose nearest learned mean is within
        ||6*1||_2 (reference: gmm.py:112-118).  The marginal-comparison plots
        are produced by the runner's plotting helpers when enabled."""
        active = int(model_state.num_active)
        means = np.asarray(model_state.means[:active])
        dists = np.linalg.norm(
            self.target_means[:, None, :] - means[None, :, :], axis=2
        ).min(axis=1)
        threshold = np.linalg.norm(6.0 * np.ones(self.get_num_dimensions()))
        metrics = {"num_detected_modes": int(np.sum(dists < threshold))}
        if self.make_plots and self.get_num_dimensions() >= 2:
            from gmmvi_tpu.experiments.evaluation.plotting import (
                marginal_comparison_figure,
            )

            metrics["marginals"] = marginal_comparison_figure(
                self, model_state, (-70, 70), grid=(4, 5)
            )
        return metrics


class DIAGGMM_LNPDF(GMM_LNPDF):
    """Diagonal-covariance GMM target (reference: diag_gmm.py:9-31)."""

    def __init__(self, target_weights, target_means, target_covs):
        super().__init__(target_weights, target_means, target_covs, diagonal=True)

    def expensive_metrics(self, model_state, samples) -> dict:
        return {}


def make_target(num_dimensions: int, seed: int = None) -> GMM_LNPDF:
    """Random 10-component GMM: means ~ 100*(U-0.5), covs A^T A + I with
    A ~ 0.1*N(0, D) (reference: gmm.py:123-145)."""
    rng = np.random.RandomState(seed)
    num_true_components = 10
    weights = np.ones(num_true_components) / num_true_components
    means = 100.0 * (rng.random((num_true_components, num_dimensions)) - 0.5)
    covs = np.empty((num_true_components, num_dimensions, num_dimensions))
    for i in range(num_true_components):
        a = 0.1 * rng.normal(0, num_dimensions,
                             (num_dimensions, num_dimensions))
        covs[i] = a.T @ a + np.eye(num_dimensions)
    return GMM_LNPDF(weights, means, covs)


def make_target_with_scale(num_dimensions: int, num_components: int,
                           scale: float, seed: int = None) -> GMM_LNPDF:
    """Random GMM with configurable component count and covariance scale:
    covs A^T A + I with A ~ N(0, sqrt(scale)) (reference: gmm.py:148-160)."""
    rng = np.random.RandomState(seed)
    weights = np.ones(num_components) / num_components
    means = 100.0 * (rng.random((num_components, num_dimensions)) - 0.5)
    covs = np.empty((num_components, num_dimensions, num_dimensions))
    for i in range(num_components):
        a = rng.normal(0, math.sqrt(scale),
                       (num_dimensions, num_dimensions))
        covs[i] = a.T @ a + np.eye(num_dimensions)
    return GMM_LNPDF(weights, means, covs)


def make_diag_target(num_dimensions: int, seed: int = None) -> DIAGGMM_LNPDF:
    """Random 10-component diagonal GMM (reference: diag_gmm.py:33-43)."""
    rng = np.random.RandomState(seed)
    k = 10
    weights = np.ones(k) / k
    means = 100.0 * (rng.random((k, num_dimensions)) - 0.5)
    covs = 10.0 * rng.random((k, num_dimensions))
    return DIAGGMM_LNPDF(weights, means, covs)


def _rot(theta):
    return np.array(
        [[math.cos(theta), math.sin(theta)], [-math.sin(theta), math.cos(theta)]]
    )


def make_simple_target() -> GMM_LNPDF:
    """3-component 2-D mixture (reference: gmm.py:174-205)."""
    w = np.array([0.5, 0.3, 0.2])
    mu = np.array([[-2.0, -2.0], [2.0, -2.0], [0.0, 2.0]])
    c1 = _rot(math.pi / 4) @ np.diag([0.5, 1.0]) @ _rot(math.pi / 4).T
    c2 = _rot(-math.pi / 4) @ np.diag([0.5, 1.0]) @ _rot(-math.pi / 4).T
    c3 = _rot(math.pi / 2) @ np.diag([1.0, 2.0]) @ _rot(math.pi / 2).T
    return GMM_LNPDF(w, mu, np.stack([c1, c2, c3]))


def make_star_target(num_components: int) -> GMM_LNPDF:
    """Lin et al. star target: rotated anisotropic components
    (reference: gmm.py:208-237)."""
    k = num_components
    w = np.ones(k) / k
    mus = [np.array([1.5, 0.0])]
    precs = [np.diag([1.0, 100.0])]
    theta = 2 * math.pi / k
    u = _rot(theta)
    for _ in range(k - 1):
        mus.append(u @ mus[-1])
        precs.append(u @ precs[-1] @ u.T)
    covs = np.linalg.inv(np.stack(precs))
    return GMM_LNPDF(w, np.stack(mus), covs)
