"""Planar-robot visualization helpers (matplotlib).

(reference: src/gmmvi/experiments/evaluation/visualize_planar_robot.py)
Renders arm configurations for mixture means, weighted by component weight.
"""
from __future__ import annotations

import numpy as np


def visualize_mixture(mixture_weights, mixture_means, link_lengths=None,
                      ax=None, goals=None):
    """Draw each component mean as an arm configuration; line alpha encodes
    the component weight (reference: visualize_planar_robot.py:108-142)."""
    import matplotlib.pyplot as plt

    mixture_weights = np.asarray(mixture_weights)
    mixture_means = np.asarray(mixture_means)
    num_dimensions = mixture_means.shape[1]
    if link_lengths is None:
        link_lengths = np.ones(num_dimensions)
    if ax is None:
        ax = plt.gca()
    ax.set_xlim([-num_dimensions, num_dimensions])
    ax.set_ylim([-num_dimensions, num_dimensions])

    wspan = mixture_weights.max() - mixture_weights.min()
    if wspan != 0:
        alphas = 0.1 + 0.9 * (mixture_weights - mixture_weights.min()) / wspan
    else:
        alphas = np.ones(len(mixture_weights))

    for theta, alpha in zip(mixture_means, alphas):
        angles = np.cumsum(theta)
        xs = np.concatenate([[0.0], np.cumsum(link_lengths * np.cos(angles))])
        ys = np.concatenate([[0.0], np.cumsum(link_lengths * np.sin(angles))])
        ax.plot(xs, ys, color="k", linestyle="-", linewidth=2, alpha=alpha)
        ax.plot(xs[-1], ys[-1], "o", color="red", alpha=alpha, markersize=6)

    if goals is not None:
        for g in np.asarray(goals):
            ax.plot(g[0], g[1], "rx", markersize=10, mew=2)
    return ax


def visualize_samples(samples, thinning=1, link_lengths=None, ax=None):
    """Draw sampled arm configurations
    (reference: visualize_planar_robot.py:8-29)."""
    samples = np.asarray(samples)[::thinning]
    weights = np.ones(len(samples))
    return visualize_mixture(weights, samples, link_lengths=link_lengths, ax=ax)
