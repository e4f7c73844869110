"""Config system: codenames, YAML defaults, merging, all 432 combinations."""
import itertools

import numpy as np
import pytest

from gmmvi_tpu.configs import (
    ALL_CODENAME_LETTERS,
    get_default_algorithm_config,
    get_default_config,
    get_default_experiment_config,
    update_config,
)

SLOT_KEYS = [
    "ng_estimator_type",
    "num_component_adapter_type",
    "sample_selector_type",
    "ng_based_updater_type",
    "component_stepsize_adapter_type",
    "weight_updater_type",
    "weight_stepsize_adapter_type",
]


def all_codenames():
    return [
        "".join(parts)
        for parts in itertools.product(*ALL_CODENAME_LETTERS.values())
    ]


def test_432_codenames_resolve():
    names = all_codenames()
    assert len(names) == 432
    for name in names:
        cfg = get_default_algorithm_config(name)
        for key in SLOT_KEYS:
            assert key in cfg, f"{name} missing {key}"
            assert f"{key.rsplit('_type', 1)[0]}_config" in cfg


def test_known_codenames():
    samtron = get_default_algorithm_config("SAMTRON")
    assert samtron["ng_estimator_type"] == "Stein"
    assert samtron["num_component_adapter_type"] == "adaptive"
    assert samtron["sample_selector_type"] == "component-based"
    assert samtron["ng_based_updater_type"] == "trust-region"
    assert samtron["component_stepsize_adapter_type"] == "improvement-based"
    assert samtron["weight_updater_type"] == "trust-region"
    assert samtron["weight_stepsize_adapter_type"] == "improvement_based"

    zamtrux = get_default_algorithm_config("ZAMTRUX")  # VIPS
    assert zamtrux["ng_estimator_type"] == "MORE"
    assert zamtrux["weight_updater_type"] == "direct"
    assert zamtrux["weight_stepsize_adapter_type"] == "fixed"

    sepifux = get_default_algorithm_config("SEPIFUX")  # Lin et al.
    assert sepifux["sample_selector_type"] == "mixture-based"
    assert sepifux["ng_based_updater_type"] == "direct"
    assert get_default_algorithm_config("SEPYFUX")["ng_based_updater_type"] == "iBLR"


def test_experiment_configs_load():
    for name in ["stm20", "stm300", "gmm20", "gmm100", "breast_cancer",
                 "german_credit", "planar_robot_4", "wine", "talos",
                 "breast_cancer_mb", "german_credit_mb"]:
        cfg = get_default_experiment_config(name)
        assert "environment_name" in cfg
        assert "model_initialization" in cfg
        assert "temperature" in cfg
        assert "start_seed" in cfg


def test_update_config_replace_semantics():
    base = {"a": {"b": 1, "c": 2}, "d": [1, 2, 3]}
    updated = update_config(base, {"a": {"b": 10}, "d": [9]})
    assert updated["a"] == {"b": 10, "c": 2}
    assert updated["d"] == [9]
    assert base["a"]["b"] == 1  # original untouched


def test_unknown_letter_raises():
    with pytest.raises(ValueError):
        get_default_algorithm_config("Q")


@pytest.mark.parametrize(
    "codename",
    ["SAMTRON", "ZAMTRUX", "SEPIFUX", "SEMTRUX", "SAMYROX", "ZEPIFUG",
     "SEMIDOX", "ZAPTRON"],
)
def test_representative_codenames_build_and_step(codename):
    """Representative coverage of the module matrix: build a GMMVI instance
    from each codename's defaults and run two training iterations."""
    import jax
    from gmmvi_tpu.experiments.setup import init_experiment
    from gmmvi_tpu.optimization.gmmvi import GMMVI
    from gmmvi_tpu.experiments.targets.gmm import make_simple_target

    cfg = get_default_algorithm_config(codename)
    cfg = update_config(cfg, {
        "start_seed": 0,
        "target_fn": make_simple_target(),
        "environment_name": "simple",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 2,
            "prior_mean": 0.0, "prior_scale": 2.0, "initial_cov": 2.0,
        },
        "use_sample_database": True, "max_database_size": 10000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 8,
                                   "ratio_reused_samples_to_desired": 1.0},
        "gmmvi_runner_config": {"log_metrics_interval": 10},
        "tpu": {"max_components": 4},
    })
    if cfg["num_component_adapter_type"] == "adaptive":
        cfg = update_config(cfg, {"num_component_adapter_config": {
            "del_iters": 5, "add_iters": 3, "num_database_samples": 64,
        }})
    # direct/iBLR updaters need small stepsizes (reference example 3 notes)
    if cfg["ng_based_updater_type"] in ("direct", "iBLR"):
        cfg = update_config(cfg, {"component_stepsize_adapter_config": {
            "initial_stepsize": 1e-4,
        }})

    target, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    for _ in range(2):
        gmmvi.train_iter()
    means = np.asarray(gmmvi.state.model.means)
    assert np.all(np.isfinite(means[: int(gmmvi.state.model.num_active)]))


def test_tpu_enum_values_validated():
    import pytest

    from gmmvi_tpu.configs import get_default_config, update_config
    from gmmvi_tpu.configs.validate import ConfigError, validate_config

    cfg = get_default_config("SAMTRON", "gmm20")
    bad = update_config(cfg, {"tpu": {"db_layout": "shardd"}})
    with pytest.raises(ConfigError, match="db_layout.*shardd"):
        validate_config(bad)
    ok = update_config(cfg, {"tpu": {"db_eviction": "decimate",
                                     "compact_target_eval": "off"}})
    validate_config(ok)
