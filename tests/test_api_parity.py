"""API-surface parity helpers: linear fit, shuffled component sampling, and
full 432-codename construction."""
import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gmmvi_tpu.configs import (
    ALL_CODENAME_LETTERS,
    get_default_algorithm_config,
    update_config,
)
from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.ops.quadratic import fit_linear


def test_fit_linear():
    rng = np.random.RandomState(0)
    n, d = 100, 3
    x = rng.randn(n, d).astype(np.float32)
    w_true = np.asarray([1.0, -2.0, 0.5], np.float32)
    y = x @ w_true + 0.7
    params = np.asarray(fit_linear(jnp.asarray(1e-8), jnp.asarray(x),
                                   jnp.asarray(y)))
    np.testing.assert_allclose(params[:d], w_true, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(params[d], 0.7, rtol=1e-3)


def test_sample_from_components_shuffled():
    rng = np.random.RandomState(1)
    k, d = 2, 3
    mu = np.stack([np.zeros(d), 50 * np.ones(d)]).astype(np.float32)
    covs = np.tile(np.eye(d, dtype=np.float32)[None], (k, 1, 1))
    state = G.create_gmm_state(np.ones(k, np.float32) / k, mu, covs,
                               max_components=4)
    n = 500
    smp = np.asarray(
        G.sample_from_components_shuffled(state, jax.random.PRNGKey(0), n)
    )
    valid = smp[: k * n]
    # both components represented equally among valid rows
    near_zero = np.sum(np.linalg.norm(valid, axis=1) < 25)
    assert near_zero == n
    # shuffled: first 2n rows are a mix, not grouped
    first_block = valid[:n]
    assert 0.3 * n < np.sum(np.linalg.norm(first_block, axis=1) < 25) < 0.7 * n


@pytest.mark.slow
def test_all_432_codenames_instantiate():
    """Construct a GMMVI instance (no stepping) from every codename."""
    from gmmvi_tpu.experiments.setup import init_experiment
    from gmmvi_tpu.experiments.targets.gmm import make_simple_target
    from gmmvi_tpu.optimization.gmmvi import GMMVI

    target = make_simple_target()
    base = {
        "start_seed": 0, "target_fn": target, "environment_name": "t",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 2,
            "prior_mean": 0.0, "prior_scale": 2.0, "initial_cov": 2.0,
        },
        "use_sample_database": True, "max_database_size": 1000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 4,
                                   "ratio_reused_samples_to_desired": 0.5},
        "num_component_adapter_config": {"del_iters": 4, "add_iters": 3,
                                         "num_database_samples": 32},
        "gmmvi_runner_config": {"log_metrics_interval": 10},
        "tpu": {"max_components": 4},
    }
    names = ["".join(p) for p in
             itertools.product(*ALL_CODENAME_LETTERS.values())]
    assert len(names) == 432
    for name in names:
        cfg = update_config(get_default_algorithm_config(name), base)
        cfg["target_fn"] = target
        t, model, meta = init_experiment(cfg)
        gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
        assert gmmvi.estimator_type in ("Stein", "MORE")
