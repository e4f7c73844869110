"""Head-to-head vs the actual reference on breast-cancer logistic regression.

Second comparison workload beyond the stm20 flagship
(scripts/compare_reference.py): SAMTRON on the 31-D breast-cancer
posterior, K0=1 growing adaptively, n_des=100, reuse 2.0 — the reference's
breastCancer recipe.  The reference runs its own bundled implementation
(CPU TensorFlow, its own dataset file); ours runs on the attached device
with the same shapes and the bundled copy of the same dataset (density
oracle-equality is covered by tests/test_reference_parity.py).

Run:   python scripts/compare_reference_logreg.py [iters]
"""
from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference/src"


def algorithm_config(n_des, kmax):
    from gmmvi_tpu.configs import get_default_algorithm_config, update_config

    cfg = get_default_algorithm_config("SAMTRON")
    return update_config(cfg, {
        "temperature": 1.0,
        "use_sample_database": True,
        "max_database_size": 10_000_000,
        "sample_selector_config": {
            "desired_samples_per_component": n_des,
            "ratio_reused_samples_to_desired": 2.0,
        },
        "num_component_adapter_config": {"max_components": kmax},
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 1,
            "prior_mean": 0.0, "prior_scale": 10.0, "initial_cov": 100.0,
        },
    })


def run_reference(iters, n_des, kmax, seed=0):
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    from compare_reference import install_tfp_shim

    install_tfp_shim(tf)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from gmmvi.experiments.setup_experiment import init_experiment
    from gmmvi.optimization.gmmvi import GMMVI

    tf.random.set_seed(seed)
    np.random.seed(seed)
    cfg = algorithm_config(n_des, kmax)
    cfg["environment_name"] = "breastCancer"
    cfg["environment_config"] = {}
    cfg["seed"] = seed
    target, wrapped = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(config=cfg, target_distribution=target,
                                    model=wrapped)
    t0 = time.perf_counter()
    gmmvi.train_iter()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        gmmvi.train_iter()
    per_iter = (time.perf_counter() - t0) / max(iters - 1, 1)

    samples = gmmvi.model.sample(2000)[0]
    elbo = float(
        tf.reduce_mean(target.log_density(samples))
        - tf.reduce_mean(gmmvi.model.log_density(samples))
    )
    return {
        "elbo": elbo,
        "per_iter_s": per_iter,
        "first_iter_s": compile_s,
        "num_components": int(gmmvi.model.num_components),
        "fevals": int(gmmvi.sample_db.num_samples_written.numpy()),
    }


def run_ours(iters, n_des, kmax, seed=0):
    import jax
    import jax.numpy as jnp

    from gmmvi_tpu.configs import update_config
    from gmmvi_tpu.experiments.setup import init_experiment
    from gmmvi_tpu.optimization.gmmvi import GMMVI
    from gmmvi_tpu.models import gmm as gmm_ops

    cfg = algorithm_config(n_des, kmax)
    cfg = update_config(cfg, {
        "environment_name": "breastCancer", "environment_config": {},
        "seed": seed, "gmmvi_runner_config": {"log_metrics_interval": 100},
        # padding defaults tight (auto-repad grows it on demand)
    })
    target, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)

    block = 50
    t0 = time.perf_counter()
    gmmvi.train_iters(block)  # compiles the scan-of-50 program
    jax.block_until_ready(gmmvi.state.model.means)
    compile_s = time.perf_counter() - t0
    blocks = max((iters - block) // block, 1)
    t0 = time.perf_counter()
    for _ in range(blocks):
        gmmvi.train_iters(block)
    jax.block_until_ready(gmmvi.state.model.means)
    per_iter = (time.perf_counter() - t0) / (blocks * block)

    key = jax.random.PRNGKey(seed + 1)
    samples, _ = gmm_ops.sample(gmmvi.state.model, key, 2000)
    elbo = float(
        jnp.mean(target.log_density(samples))
        - jnp.mean(gmm_ops.log_density(gmmvi.state.model, samples))
    )
    db = gmmvi.state.db
    return {
        "elbo": elbo,
        "per_iter_s": per_iter,
        "first_iter_s": compile_s,
        "num_components": int(gmmvi.state.model.num_active),
        "fevals": int(db.num_samples_written),
    }


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    n_des, kmax = 100, 64
    ours = run_ours(iters, n_des, kmax)
    ref = run_reference(iters, n_des, kmax)
    print(f"{'':14s} {'reference (CPU TF)':>20s} {'ours':>16s}")
    for k in ("elbo", "per_iter_s", "first_iter_s", "num_components",
              "fevals"):
        print(f"{k:14s} {ref[k]:>20.6g} {ours[k]:>16.6g}")
    print(f"speedup (per-iter): {ref['per_iter_s'] / ours['per_iter_s']:.1f}x")


if __name__ == "__main__":
    main()
