"""Diagonal-covariance model family: end-to-end and module checks."""
import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.configs import get_default_algorithm_config, update_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.experiments.targets.gmm import make_diag_target
from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.optimization.gmmvi import GMMVI


def _diag_config(codename="SAMTRON", d=3, seed=0):
    target = make_diag_target(d, seed=1)
    cfg = get_default_algorithm_config(codename)
    return target, update_config(cfg, {
        "start_seed": seed, "seed": seed,
        "target_fn": target, "environment_name": "diag",
        "model_initialization": {
            "use_diagonal_covs": True, "num_initial_components": 3,
            "prior_mean": 0.0, "prior_scale": 40.0, "initial_cov": 900.0,
        },
        "use_sample_database": True, "max_database_size": 100000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 24,
                                   "ratio_reused_samples_to_desired": 1.0},
        "num_component_adapter_config": {
            "del_iters": 8, "add_iters": 4, "max_components": 12,
            "thresholds_for_add_heuristic": [500.0, 100.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 256, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": 12},
    })


def test_diagonal_samtron_runs_and_improves():
    target, cfg = _diag_config()
    t, model, meta = init_experiment(cfg)
    assert model.diagonal
    assert model.chols.ndim == 2
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)

    def elbo():
        samples, _ = G.sample(gmmvi.state.model, jax.random.PRNGKey(0), 2000)
        return float(
            jnp.mean(target.log_density(samples))
            - jnp.mean(G.log_density(gmmvi.state.model, samples))
        )

    e0 = elbo()
    for _ in range(40):
        gmmvi.train_iter()
    e1 = elbo()
    assert np.isfinite(e1)
    assert e1 > e0 + 1.0


def test_diagonal_direct_updater():
    target, cfg = _diag_config(codename="SEMIDUX")
    cfg = update_config(cfg, {"component_stepsize_adapter_config": {
        "initial_stepsize": 1e-4,
    }})
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    for _ in range(5):
        gmmvi.train_iter()
    chols = np.asarray(gmmvi.state.model.chols)
    k = int(gmmvi.state.model.num_active)
    assert np.all(np.isfinite(chols[:k])) and np.all(chols[:k] > 0)


def test_diagonal_more_estimator():
    target, cfg = _diag_config(codename="ZEMTRON")
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    for _ in range(3):
        gmmvi.train_iter()
    assert np.all(np.isfinite(
        np.asarray(gmmvi.state.model.means)[: int(gmmvi.state.model.num_active)]
    ))
