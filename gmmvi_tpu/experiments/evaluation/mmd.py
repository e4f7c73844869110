"""Maximum Mean Discrepancy against a ground-truth sample.

(reference: src/gmmvi/experiments/evaluation/mmd.py)

Bandwidth by the median trick over <= 1000 ground-truth points, diagonal
kernel scaled by alpha; MMD^2 = U1/n1^2 + U2/n2^2 - 2*mix/(n1*n2).  The
reference computes the kernels with per-row Python loops; here they are single
batched matmul/reduction programs.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


class MMD:
    """(reference: mmd.py:4-78)"""

    def __init__(self, groundtruth, alpha: float):
        self.groundtruth = jnp.asarray(groundtruth, jnp.float32)
        self.num_groundtruth = int(self.groundtruth.shape[0])
        self.sigma = self._compute_sigma()
        self._kernel_sum = jax.jit(self._kernel_sum_impl)
        self.set_alpha(alpha)

    def _compute_sigma(self, max_points_for_median: int = 1000) -> jnp.ndarray:
        """Per-dimension median of squared pairwise differences
        (reference: mmd.py:26-36)."""
        n = min(max_points_for_median, self.num_groundtruth)
        g = np.asarray(self.groundtruth[:n])
        iu, ju = np.triu_indices(n)
        sq = np.square(g[iu] - g[ju])   # includes i == j, like the reference
        return jnp.asarray(np.median(sq, axis=0), jnp.float32)

    def _kernel_sum_impl(self, a, b, inv_diag):
        """sum_{i,j} exp(-(a_i - b_j)^T K (a_j - b_j)) with diagonal K."""
        aw = a * inv_diag[None, :]
        a2 = jnp.sum(aw * a, axis=1)
        b2 = jnp.sum((b * inv_diag[None, :]) * b, axis=1)
        cross = jnp.einsum("id,jd->ij", aw, b, precision=_PREC)
        d2 = a2[:, None] + b2[None, :] - 2.0 * cross
        return jnp.sum(jnp.exp(-d2))

    def set_alpha(self, alpha: float):
        self._alpha = float(alpha)
        self._inv_diag = 1.0 / (self._alpha * self.sigma)
        self.ustat1 = self._kernel_sum(
            self.groundtruth, self.groundtruth, self._inv_diag
        )

    def compute_MMD(self, model_sample) -> float:
        """(reference: mmd.py:62-78)"""
        sample = jnp.asarray(model_sample, jnp.float32)
        n1 = self.num_groundtruth
        n2 = sample.shape[0]
        u2 = self._kernel_sum(sample, sample, self._inv_diag)
        mix = self._kernel_sum(self.groundtruth, sample, self._inv_diag)
        return float(
            self.ustat1 / n1**2 + u2 / n2**2 - 2.0 * mix / (n1 * n2)
        )
