"""Eval-row reduction from bucketed target evaluation (incl. shard-local).

VERDICT r3 item 4's acceptance: show that with an EXPENSIVE target, the
bucketed evaluation (global argsort compaction on single devices,
shard-local compaction under the sharded DB layout) evaluates ~2x the
valid rows instead of every padded proposal row, and what that does to
step time.

The target is a deliberately heavy jit-safe density (a wide synthetic GMM
with many components) so the per-row target cost dominates the step.  In
steady state with sample reuse, ~K*n_des proposal rows exist but only
~max(1, n_des - n_eff) per component are valid (a few percent).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
         PYTHONPATH= python scripts/bench_bucketed_eval.py      # CPU mesh
     python scripts/bench_bucketed_eval.py                      # single TPU
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gmmvi_tpu.configs import get_default_algorithm_config, update_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.experiments.targets.gmm import make_target_with_scale
from gmmvi_tpu.optimization.gmmvi import GMMVI


def build(compact: str, mesh=None, db_layout=None):
    # 256-component 16-D GMM target: each density eval is a [T=256, D, D]
    # whitening chain per row — expensive enough that eval rows dominate
    target = make_target_with_scale(num_dimensions=16, num_components=256,
                                    scale=1.0, seed=0)
    tpu = {"max_components": 16, "compact_target_eval": compact}
    if db_layout:
        tpu["db_layout"] = db_layout
    cfg = get_default_algorithm_config("SAMTRON")
    cfg = update_config(cfg, {
        "start_seed": 0, "seed": 0, "target_fn": target,
        "environment_name": "bench",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 8,
            "prior_mean": 0.0, "prior_scale": 30.0, "initial_cov": 100.0,
        },
        "use_sample_database": True, "max_database_size": 1000000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 128,
                                   "ratio_reused_samples_to_desired": 3.0},
        "num_component_adapter_config": {
            "del_iters": 100, "add_iters": 25, "max_components": 16,
            "thresholds_for_add_heuristic": [1000.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 512, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 1000},
        "tpu": tpu,
    })
    t, model, meta = init_experiment(cfg)
    return GMMVI.build_from_config(cfg, t, model, meta, mesh=mesh)


def time_steps(g, iters=30):
    g.train_iters(10)  # reach reuse steady state + compile
    jax.block_until_ready(g.state.model.means)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        g.train_iters(iters)
        jax.block_until_ready(g.state.model.means)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    n_dev = len(jax.devices())
    rows = []
    if n_dev >= 8:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
        for compact in ("off", "auto"):
            g = build(compact, mesh=mesh, db_layout="sharded")
            rows.append({
                "mode": f"sharded-db compact={compact}",
                "ms_per_iter": round(time_steps(g), 2),
                "batch_rows": g.state.model.max_components
                * g.selector_cfg.desired_samples_per_component,
                "buckets": list(g._eval_buckets or []),
            })
            print(json.dumps(rows[-1]), flush=True)
    else:
        for compact in ("off", "auto"):
            g = build(compact)
            rows.append({
                "mode": f"single-device compact={compact}",
                "ms_per_iter": round(time_steps(g), 2),
                "batch_rows": g.state.model.max_components
                * g.selector_cfg.desired_samples_per_component,
                "buckets": list(g._eval_buckets or []),
            })
            print(json.dumps(rows[-1]), flush=True)
    if len(rows) == 2:
        print(json.dumps({
            "speedup_from_bucketing":
                round(rows[0]["ms_per_iter"] / rows[1]["ms_per_iter"], 2)
        }))


if __name__ == "__main__":
    main()
