"""Mixture of multivariate Student-T target distributions.

(reference: src/gmmvi/experiments/target_distributions/student_t_mixture.py)
Implemented from the closed-form density instead of tensorflow-probability:

log St(x; nu, mu, L) = lgamma((nu+D)/2) - lgamma(nu/2) - D/2 log(nu*pi)
                       - log|L| - (nu+D)/2 log(1 + m/nu),
with m the squared Mahalanobis distance under scale matrix Sigma = L L^T.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from gmmvi_tpu.experiments.targets.lnpdf import LNPDF

_PREC = jax.lax.Precision.HIGHEST


class StudentTMixture_LNPDF(LNPDF):
    """(reference: student_t_mixture.py:15-135)"""

    def __init__(self, target_weights, target_means, target_covs, alpha=2,
                 make_plots=True):
        super().__init__(use_log_density_and_grad=True, safe_for_jit=True)
        self.make_plots = make_plots
        self.alpha = float(alpha)
        self.target_weights = np.asarray(target_weights, np.float32)
        self.target_means = np.asarray(target_means, np.float32)
        self.target_covs = np.asarray(target_covs, np.float32)
        chols = np.linalg.cholesky(self.target_covs.astype(np.float64))
        self._chols = jnp.asarray(chols, jnp.float32)
        self._inv_chols = jnp.asarray(
            np.linalg.inv(chols), jnp.float32
        )
        self._log_dets = jnp.asarray(
            np.sum(np.log(np.diagonal(chols, axis1=-2, axis2=-1)), axis=-1),
            jnp.float32,
        )
        self._log_w = jnp.asarray(
            np.log(self.target_weights / self.target_weights.sum()), jnp.float32
        )

    def _whiten(self, x):
        """([K, N, D] whitened diffs, [K, N] mahalanobis)."""
        diffs = x[None, :, :] - jnp.asarray(self.target_means)[:, None, :]
        y = jnp.einsum("kij,knj->kni", self._inv_chols, diffs, precision=_PREC)
        return y, jnp.sum(jnp.square(y), axis=-1)

    def _log_probs_from_maha(self, maha):
        nu = self.alpha
        d = self.get_num_dimensions()
        const = (
            gammaln(0.5 * (nu + d))
            - gammaln(0.5 * nu)
            - 0.5 * d * math.log(nu * math.pi)
        )
        return (
            const
            - self._log_dets[:, None]
            - 0.5 * (nu + d) * jnp.log1p(maha / nu)
        )

    def _component_log_probs(self, x):
        """[K, N] Student-T log densities."""
        return self._log_probs_from_maha(self._whiten(x)[1])

    def log_density(self, x):
        x = jnp.asarray(x, jnp.float32)
        comp = self._component_log_probs(x)
        return jax.scipy.special.logsumexp(comp + self._log_w[:, None], axis=0)

    def log_density_and_grad(self, x):
        """Analytic mixture gradient — one forward whitening pass instead of
        per-sample reverse-mode AD (numerics match autodiff to float
        rounding; the reference differentiates with a GradientTape,
        sample_selector.py:69-78):

            grad log p(x) = -sum_k r_k(x) (nu+D)/(nu+maha_k) L_k^{-T} y_k

        with responsibilities r_k = softmax_k(log t_k + log w_k) and
        y_k = L_k^{-1}(x - mu_k)."""
        nu = self.alpha
        d = self.get_num_dimensions()
        x = jnp.asarray(x, jnp.float32)
        y, maha = self._whiten(x)
        comp = self._log_probs_from_maha(maha)
        weighted = comp + self._log_w[:, None]
        ld = jax.scipy.special.logsumexp(weighted, axis=0)
        resp = jnp.exp(weighted - ld[None, :])                 # [K, N]
        scale = resp * (nu + d) / (nu + maha)                  # [K, N]
        # Lambda_k (x - mu_k) = L_k^{-T} y_k; contract K on the fly
        # ((L^{-T} y)_j = sum_i (L^{-1})_{ij} y_i)
        grads = -jnp.einsum("kij,kni,kn->nj", self._inv_chols, y, scale,
                            precision=_PREC)
        return ld, grads

    def marginal_log_density(self, x, dim):
        """1-D marginal mixture of Student-Ts along ``dim``
        (reference: student_t_mixture.py:46-64)."""
        nu = self.alpha
        x = jnp.asarray(x, jnp.float32)[:, dim]
        mu = jnp.asarray(self.target_means[:, dim])
        scale = jnp.sqrt(jnp.asarray(self.target_covs[:, dim, dim]))
        z = (x[None, :] - mu[:, None]) / scale[:, None]
        const = (
            gammaln(0.5 * (nu + 1))
            - gammaln(0.5 * nu)
            - 0.5 * math.log(nu * math.pi)
        )
        comp = const - jnp.log(scale)[:, None] - 0.5 * (nu + 1) * jnp.log1p(
            jnp.square(z) / nu
        )
        return jax.scipy.special.logsumexp(comp + self._log_w[:, None], axis=0)

    def get_num_dimensions(self):
        return self.target_means.shape[1]

    def can_sample(self):
        return True

    def sample(self, key, n):
        """x = mu_k + L_k z * sqrt(nu / chi2_nu) with k ~ weights."""
        k_key, z_key, g_key = jax.random.split(key, 3)
        comp = jax.random.categorical(k_key, self._log_w, shape=(n,))
        d = self.get_num_dimensions()
        z = jax.random.normal(z_key, (n, d))
        chi2 = 2.0 * jax.random.gamma(g_key, 0.5 * self.alpha, (n,))
        scale = jnp.sqrt(self.alpha / chi2)
        lz = jnp.einsum("nij,nj->ni", self._chols[comp], z, precision=_PREC)
        return jnp.asarray(self.target_means)[comp] + lz * scale[:, None]

    def expensive_metrics(self, model_state, samples) -> dict:
        """num_detected_modes by nearest-mean distance < ||6*1||
        (reference: student_t_mixture.py:127-133)."""
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
                self, model_state, (-25, 25), grid=(5, 4)
            )
        return metrics


def make_target(num_dimensions: int, harder_setting: bool,
                use_matlab_target: bool = False,
                seed: int = None) -> StudentTMixture_LNPDF:
    """Random Student-T mixture with the Lin et al. (2020) construction:
    20D -> 10 comps spread s=20, 300D -> 20 comps spread s=25; covariances are
    inverses of A^T A + I with A ~ 0.1 * D * N(0, 1)
    (reference: student_t_mixture.py:138-194).  MATLAB ground-truth loading is
    not bundled (the reference's data files are not shipped either)."""
    if use_matlab_target:
        raise NotImplementedError(
            "MATLAB ground-truth targets are not bundled (the reference repo "
            "does not ship the data files referenced at "
            "student_t_mixture.py:171-193)."
        )
    if harder_setting:
        s, num_components = 25, 20
    else:
        s, num_components = 20, 10
    rng = np.random.RandomState(seed)
    weights = np.ones(num_components) / num_components
    means = rng.uniform(0, 1, (num_components, num_dimensions)) * (2 * s) - s
    covs = np.empty((num_components, num_dimensions, num_dimensions))
    for i in range(num_components):
        a = 0.1 * num_dimensions * rng.normal(
            0, 1, (num_dimensions, num_dimensions)
        )
        covs[i] = np.linalg.inv(a.T @ a + np.eye(num_dimensions))
    return StudentTMixture_LNPDF(weights, means, covs)
