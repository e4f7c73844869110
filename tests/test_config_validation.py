"""Config validation: friendly, exhaustive error messages up front
(TODO.md completeness item; the reference fails with bare KeyErrors)."""
import pytest

from gmmvi_tpu.configs import (ConfigError, get_default_config,
                               update_config, validate_config)


def _good_config():
    return update_config(
        get_default_config("SAMTRON", "stm20"),
        {"environment_config": {"num_dimensions": 4}},
    )


def test_valid_config_passes():
    validate_config(_good_config(), require_target=True)


def test_all_432_codenames_validate():
    import itertools

    from gmmvi_tpu.configs import ALL_CODENAME_LETTERS

    for letters in itertools.product(*ALL_CODENAME_LETTERS.values()):
        cfg = get_default_config("".join(letters), "stm20")
        validate_config(cfg, require_target=True)


def test_missing_slot_reports_letters():
    cfg = _good_config()
    del cfg["ng_estimator_type"]
    with pytest.raises(ConfigError, match="codename letters S/Z"):
        validate_config(cfg)


def test_unknown_type_suggests():
    cfg = _good_config()
    cfg["ng_estimator_type"] = "stein"
    with pytest.raises(ConfigError, match="did you mean 'Stein'"):
        validate_config(cfg)


def test_missing_required_key_named():
    cfg = _good_config()
    del cfg["sample_selector_config"]["desired_samples_per_component"]
    with pytest.raises(ConfigError,
                       match="missing key 'desired_samples_per_component'"):
        validate_config(cfg)


def test_unknown_tpu_key_is_error_with_suggestion():
    cfg = _good_config()
    cfg["tpu"] = {"trust_region_serach": "bracket"}
    with pytest.raises(ConfigError, match="trust_region_search"):
        validate_config(cfg)


def test_all_problems_reported_at_once():
    cfg = _good_config()
    del cfg["temperature"]
    del cfg["weight_updater_type"]
    cfg["tpu"] = {"bogus_knob": 1}
    with pytest.raises(ConfigError, match="3 problems") as ei:
        validate_config(cfg)
    msg = str(ei.value)
    assert "temperature" in msg and "weight_updater_type" in msg \
        and "bogus_knob" in msg


def test_unknown_top_level_key_warns_not_raises():
    cfg = _good_config()
    cfg["temperatur"] = 2.0
    with pytest.warns(UserWarning, match="did you mean 'temperature'"):
        validate_config(cfg)


def test_runner_rejects_bad_config():
    from gmmvi_tpu.runner import GmmviRunner

    cfg = _good_config()
    cfg["gmmvi_runner_config"] = {"log_metrics_interval": 10}
    del cfg["sample_selector_config"]
    with pytest.raises(ConfigError, match="sample_selector_config"):
        GmmviRunner.build_from_config(cfg)
