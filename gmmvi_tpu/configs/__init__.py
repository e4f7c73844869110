"""Config system: YAML loading, 7-letter codenames, layered merging.

(reference: src/gmmvi/configs/__init__.py)

The same naming convention as the reference — each of the 7 module slots is
selected by one codename letter (e.g. SAMTRON, ZAMTRUX=VIPS, SEPIFUX=Lin et
al.), giving 2*2*2*3*3*2*3 = 432 supported instantiations
(letter -> default-config mapping at reference configs/__init__.py:17-41).
Reference experiment/algorithm configs run unmodified; TPU-specific knobs live
under an optional ``tpu:`` section.
"""
from __future__ import annotations

import copy
import os
from typing import Mapping

import yaml

_MODULE_CONF_PATH = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                                 "module_configs")
_EXPERIMENT_CONF_PATH = os.path.join(
    os.path.dirname(os.path.realpath(__file__)), "experiment_configs"
)

LETTER_TO_PATH = {
    "Z": os.path.join(_MODULE_CONF_PATH, "ng_estimator", "MORE.yml"),
    "S": os.path.join(_MODULE_CONF_PATH, "ng_estimator", "Stein.yml"),
    "A": os.path.join(_MODULE_CONF_PATH, "component_adaptation", "adaptive.yml"),
    "E": os.path.join(_MODULE_CONF_PATH, "component_adaptation", "fixed.yml"),
    "P": os.path.join(_MODULE_CONF_PATH, "sample_selector", "mixture-based.yml"),
    "M": os.path.join(_MODULE_CONF_PATH, "sample_selector", "component-based.yml"),
    "I": os.path.join(_MODULE_CONF_PATH, "ng_based_component_updater", "direct.yml"),
    "Y": os.path.join(_MODULE_CONF_PATH, "ng_based_component_updater", "iBLR.yml"),
    "T": os.path.join(_MODULE_CONF_PATH, "ng_based_component_updater",
                      "trust-region.yml"),
    "F": os.path.join(_MODULE_CONF_PATH, "component_stepsize_adaptation",
                      "fixed.yml"),
    "D": os.path.join(_MODULE_CONF_PATH, "component_stepsize_adaptation",
                      "decaying.yml"),
    "R": os.path.join(_MODULE_CONF_PATH, "component_stepsize_adaptation",
                      "improvement-based.yml"),
    "U": os.path.join(_MODULE_CONF_PATH, "weight_updater", "direct.yml"),
    "O": os.path.join(_MODULE_CONF_PATH, "weight_updater", "trust-region.yml"),
    "X": os.path.join(_MODULE_CONF_PATH, "weight_stepsize_adaptation",
                      "fixed.yml"),
    "G": os.path.join(_MODULE_CONF_PATH, "weight_stepsize_adaptation",
                      "decaying.yml"),
    "N": os.path.join(_MODULE_CONF_PATH, "weight_stepsize_adaptation",
                      "improvement-based.yml"),
}


def load_yaml(filename: str) -> dict:
    """(reference: configs/__init__.py:5-10)"""
    with open(filename, "r") as stream:
        return yaml.safe_load(stream)


def _deep_merge(base: dict, updates: Mapping) -> dict:
    """In-place deep merge with replace semantics for non-dict leaves
    (the reference uses mergedeep.Strategy.REPLACE)."""
    for key, value in updates.items():
        if (
            key in base
            and isinstance(base[key], dict)
            and isinstance(value, Mapping)
        ):
            _deep_merge(base[key], value)
        else:
            base[key] = copy.deepcopy(value)
    return base


def get_default_algorithm_config(algorithm_id: str) -> dict:
    """Merge one per-slot default YAML per codename letter
    (reference: configs/__init__.py:13-45)."""
    merged: dict = {}
    for letter in algorithm_id:
        letter = letter.upper()
        if letter not in LETTER_TO_PATH:
            raise ValueError(
                f"unknown codename letter '{letter}' in '{algorithm_id}'"
            )
        _deep_merge(merged, load_yaml(LETTER_TO_PATH[letter]))
    return merged


def get_default_experiment_config(experiment_id: str) -> dict:
    """(reference: configs/__init__.py:47-50)"""
    return load_yaml(
        os.path.join(_EXPERIMENT_CONF_PATH, f"{experiment_id}.yml")
    )


def get_default_config(algorithm_id: str, experiment_id: str) -> dict:
    """(reference: configs/__init__.py:52-55)"""
    return {
        **get_default_algorithm_config(algorithm_id),
        **get_default_experiment_config(experiment_id),
    }


def update_config(default_values: dict, updates: Mapping) -> dict:
    """(reference: configs/__init__.py:57-59)"""
    updated = copy.deepcopy(dict(default_values))
    return _deep_merge(updated, updates)


from gmmvi_tpu.configs.validate import ConfigError, validate_config  # noqa: E402

ALL_CODENAME_LETTERS = {
    "ng_estimator": "SZ",
    "component_adaptation": "AE",
    "sample_selector": "MP",
    "ng_based_component_updater": "TIY",
    "component_stepsize_adaptation": "RFD",
    "weight_updater": "OU",
    "weight_stepsize_adaptation": "NXG",
}
