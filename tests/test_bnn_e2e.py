"""End-to-end BNN posterior training through the host-target path."""
import numpy as np

from gmmvi_tpu.configs import get_default_algorithm_config, update_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.optimization.gmmvi import GMMVI


def test_wine_bnn_trains():
    from gmmvi_tpu.experiments.targets.bnn import make_WINE_target

    target = make_WINE_target(likelihood_scaling=1.0, dataset_seed=0,
                              prior_std=1.0, batch_size=64)
    cfg = get_default_algorithm_config("SEMTRON")
    cfg = update_config(cfg, {
        "start_seed": 0, "target_fn": target, "environment_name": "wine",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 2,
            "prior_mean": 0.0, "prior_scale": 1.0, "initial_cov": 1.0,
        },
        "use_sample_database": True, "max_database_size": 100000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 12,
                                   "ratio_reused_samples_to_desired": 0.0},
        "component_stepsize_adapter_config": {
            "initial_stepsize": 0.05, "min_stepsize": 0.001,
            "max_stepsize": 0.5,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": 2},
    })
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    assert not target.safe_for_jit and target.use_log_density_and_grad
    for _ in range(8):
        gmmvi.train_iter()
    k = int(gmmvi.state.model.num_active)
    means = np.asarray(gmmvi.state.model.means[:k])
    assert np.all(np.isfinite(means))
    # fevals only count valid samples (2 comps x 12 initially, then ESS-driven)
    assert int(gmmvi.state.db.num_samples_written) <= 8 * 2 * 12
    # the mixture moved from the prior toward the posterior
    assert np.abs(means).max() > 1e-3


import pytest


@pytest.mark.slow
def test_mnist_bnn_101k_dims_diagonal(monkeypatch):
    """The 101,770-dimensional MNIST BNN posterior runs end-to-end with
    diagonal covariances (the regime the reference targets with BNN_MNIST)."""
    from gmmvi_tpu.experiments.targets import datasets as data_lib
    from gmmvi_tpu.experiments.targets.bnn import make_MNIST_target

    if data_lib._find("mnist.npz") is None:
        # MNIST cannot be fetched hermetically; the synthetic stand-in keeps
        # the 101k-dim pipeline exercised (and is loudly opt-in elsewhere)
        monkeypatch.setenv("GMMVI_ALLOW_SYNTHETIC", "1")

    target = make_MNIST_target(likelihood_scaling=1.0, prior_std=1.0,
                               batch_size=32)
    assert target.get_num_dimensions() == 101770
    cfg = get_default_algorithm_config("SEMTRON")
    cfg = update_config(cfg, {
        "start_seed": 0, "target_fn": target, "environment_name": "mnist",
        "model_initialization": {
            "use_diagonal_covs": True, "num_initial_components": 1,
            "prior_mean": 0.0, "prior_scale": 1.0, "initial_cov": 1.0,
        },
        "use_sample_database": True, "max_database_size": 1000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 4,
                                   "ratio_reused_samples_to_desired": 0.0},
        "component_stepsize_adapter_config": {
            "initial_stepsize": 0.01, "min_stepsize": 0.001,
            "max_stepsize": 0.1,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": 1},
    })
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    for _ in range(3):
        gmmvi.train_iter()
    m = np.asarray(gmmvi.state.model.means[0])
    assert np.isfinite(m).all() and np.linalg.norm(m) > 0
