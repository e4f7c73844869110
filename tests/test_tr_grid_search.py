"""Grid-search trust-region mode: same KL semantics as the bracketing search."""
import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.models import meta as M
from gmmvi_tpu.optimization.component_updaters import trust_region_update
from tests.test_updaters import _setup, _spd, gauss_kl


def test_grid_search_respects_kl_bound():
    model, meta = _setup(seed=20, stepsize=0.05)
    rng = np.random.RandomState(21)
    d = 3
    hneg = np.stack([_spd(rng, d, 0.3) for _ in range(model.max_components)])
    gneg = (rng.randn(model.max_components, d) * 2).astype(np.float32)
    res = trust_region_update(model, meta, jnp.asarray(hneg),
                              jnp.asarray(gneg), meta.stepsizes,
                              search="grid", grid_size=32)
    eps = float(meta.stepsizes[0])
    for i in range(2):
        kl = gauss_kl(
            np.asarray(res.model.means[i]), np.asarray(res.model.covs[i]),
            np.asarray(model.means[i]), np.asarray(model.covs[i]),
        )
        assert kl < 1.3 * eps
        assert kl > 0.0


def test_grid_matches_bracket_closely():
    model, meta = _setup(seed=22, stepsize=0.05)
    rng = np.random.RandomState(23)
    d = 3
    hneg = np.stack([_spd(rng, d, 0.3) for _ in range(model.max_components)])
    gneg = (rng.randn(model.max_components, d)).astype(np.float32)
    res_b = trust_region_update(model, meta, jnp.asarray(hneg),
                                jnp.asarray(gneg), meta.stepsizes,
                                search="bracket")
    res_g = trust_region_update(model, meta, jnp.asarray(hneg),
                                jnp.asarray(gneg), meta.stepsizes,
                                search="grid", grid_size=64)
    # both land near the trust-region boundary (the bracket may stop anywhere
    # within its 10%-of-bound tolerance, so compare achieved KLs, not params)
    eps = float(meta.stepsizes[0])
    for res in (res_b, res_g):
        for i in range(2):
            kl = gauss_kl(
                np.asarray(res.model.means[i]), np.asarray(res.model.covs[i]),
                np.asarray(model.means[i]), np.asarray(model.covs[i]),
            )
            assert 0.0 < kl < 1.3 * eps
    # and the selected multipliers agree within an order of magnitude
    ratio = (np.asarray(res_g.meta.last_etas[:2])
             / np.asarray(res_b.meta.last_etas[:2]))
    assert np.all(ratio > 0.1) and np.all(ratio < 10.0)


def test_grid_search_end_to_end():
    from gmmvi_tpu.configs import get_default_algorithm_config, update_config
    from gmmvi_tpu.experiments.setup import init_experiment
    from gmmvi_tpu.experiments.targets.gmm import make_simple_target
    from gmmvi_tpu.optimization.gmmvi import GMMVI

    target = make_simple_target()
    cfg = get_default_algorithm_config("SAMTRON")
    cfg = update_config(cfg, {
        "start_seed": 0, "target_fn": target, "environment_name": "t",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 3,
            "prior_mean": 0.0, "prior_scale": 3.0, "initial_cov": 4.0,
        },
        "use_sample_database": True, "max_database_size": 10000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 24,
                                   "ratio_reused_samples_to_desired": 1.0},
        "num_component_adapter_config": {
            "del_iters": 8, "add_iters": 5, "max_components": 8,
            "thresholds_for_add_heuristic": [500.0, 100.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 128, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": 8, "trust_region_search": "grid"},
    })
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    assert gmmvi.trust_region_search == "grid"
    for _ in range(30):
        gmmvi.train_iter()
    samples, _ = G.sample(gmmvi.state.model, jax.random.PRNGKey(0), 2000)
    elbo = float(jnp.mean(target.log_density(samples))
                 - jnp.mean(G.log_density(gmmvi.state.model, samples)))
    assert elbo > -0.5
