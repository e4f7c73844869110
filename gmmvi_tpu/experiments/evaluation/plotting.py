"""Marginal-comparison figures for mixture targets.

(reference: the figure-building code inside
src/gmmvi/experiments/target_distributions/student_t_mixture.py:108-126 and
gmm.py:100-111 — a grid of per-dimension marginal densities, true target in
blue vs learned model in red.)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def marginal_comparison_figure(target, model_state, x_range, num_dims=20,
                               grid=(5, 4)):
    """Figure comparing target marginals to model marginals on the first
    ``num_dims`` dimensions.  ``target`` must provide
    ``marginal_log_density(x, dim)``."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gmmvi_tpu.models import gmm as gmm_ops

    d = target.get_num_dimensions()
    num_dims = min(num_dims, d, grid[0] * grid[1])
    lo, hi = x_range
    x_vals = np.linspace(lo, hi, 1000).astype(np.float32)
    x_full = np.tile(x_vals[:, None], (1, d))

    fig, axs = plt.subplots(*grid, sharex=True)
    fig.tight_layout(pad=0.2)
    axs = np.atleast_2d(axs)
    for dim in range(num_dims):
        true_d = np.exp(
            np.asarray(target.marginal_log_density(jnp.asarray(x_full), dim))
        )
        vis = np.where(true_d > 1e-4)[0]
        if len(vis) == 0:
            continue
        start, end = vis.min(), vis.max()
        model_d = np.exp(np.asarray(gmm_ops.marginal_log_density(
            model_state, jnp.asarray(x_full[start:end]), dim
        )))
        ax = axs[dim // grid[1], dim % grid[1]]
        ax.plot(x_vals[start:end], true_d[start:end], color="b", linewidth=0.5)
        ax.plot(x_vals[start:end], model_d, color="r", linewidth=0.5)
        ax.tick_params(axis="y", direction="inout", pad=2, labelsize=5.0)
        ax.tick_params(axis="x", labelsize=5.0)
    return fig
