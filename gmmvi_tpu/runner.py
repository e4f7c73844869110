"""GmmviRunner: training loop with metrics, logging, dumps and real resume.

(reference: src/gmmvi/gmmvi_runner.py)

Same metric names and cadence as the reference: cheap metrics every iteration
(num_samples = cumulative target fevals, num_components, max_weight, DB
sizes), expensive metrics every ``log_metrics_interval`` iterations (-elbo /
entropy / target_density from a 2000-sample MC estimate, target-specific
metrics, optional MMD, cumulative algo_time), a console progress line, and
npz model dumps.  Additionally: full-state checkpointing with actual resume
(the reference's dumps are write-only, gmmvi_runner.py:177-200).
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.models import gmm as gmm_ops
from gmmvi_tpu.optimization.gmmvi import GMMVI
from gmmvi_tpu.utils import checkpoint as ckpt


def get_process_memory() -> int:
    """Process RSS in bytes (reference: gmmvi_runner.py:18-21)."""
    import psutil

    return psutil.Process(os.getpid()).memory_info().rss


class GmmviRunner:
    """(reference: gmmvi_runner.py:23-200)"""

    def __init__(self, config: dict, log_metrics_interval: int,
                 mesh: Optional[jax.sharding.Mesh] = None):
        from gmmvi_tpu.configs.validate import validate_config

        validate_config(config, require_target="target_fn" not in config)
        if "seed" not in config:
            if "start_seed" not in config:
                raise ValueError(
                    "config needs 'seed' or 'start_seed' (the reference "
                    "experiment configs set start_seed)")
            config["seed"] = config["start_seed"]
        self.config = config
        self.log_metrics_interval = int(log_metrics_interval)
        self.wall_times = []

        target, model, meta = init_experiment(config)
        self.gmmvi = GMMVI.build_from_config(config, target, model, meta,
                                             mesh=mesh)
        self.target_distribution = target

        self._eval_key = jax.random.PRNGKey(int(config["seed"]) + 7777)
        self._samples_and_entropy = jax.jit(
            self._samples_and_entropy_impl, static_argnums=1
        )

        if "mmd_evaluation_config" in config:
            from gmmvi_tpu.experiments.evaluation.mmd import MMD

            mc = config["mmd_evaluation_config"]
            samples = np.load(mc["sample_dir"])
            self.mmd = MMD(samples, mc["alpha"])
        else:
            self.mmd = None

        if "dump_gmm_path" in config:
            self.dump_gmms = True
            self.dump_gmm_path = os.path.join(
                config["dump_gmm_path"], str(time.time())
            )
            os.makedirs(self.dump_gmm_path, exist_ok=True)
        else:
            self.dump_gmms = False

    @staticmethod
    def build_from_config(config: dict,
                          mesh: Optional[jax.sharding.Mesh] = None
                          ) -> "GmmviRunner":
        """(reference: gmmvi_runner.py:63-81).  A mesh may be passed
        programmatically or requested from YAML via ``tpu.data_shards`` /
        ``tpu.comp_shards`` (see parallel.mesh.mesh_from_config)."""
        if mesh is None:
            from gmmvi_tpu.parallel.mesh import mesh_from_config

            mesh = mesh_from_config(config.get("tpu", {}) or {})
        return GmmviRunner(config=config, mesh=mesh,
                           **config["gmmvi_runner_config"])

    # ------------------------------------------------------------------
    def _samples_and_entropy_impl(self, model_state, num_samples, key):
        """2000-sample MC entropy estimate (reference: gmmvi_runner.py:83-100)."""
        samples, _ = gmm_ops.sample(model_state, key, num_samples)
        entropy = -jnp.mean(gmm_ops.log_density(model_state, samples))
        return samples, entropy

    @staticmethod
    @jax.jit
    def _cheap_metrics_device(state):
        """All cheap metrics as one device array (single host fetch)."""
        from gmmvi_tpu.optimization.sample_db import SampleDbState
        from gmmvi_tpu.optimization.sample_db_sharded import (
            ShardedSampleDbState)

        if isinstance(state.db, SampleDbState):
            db_size = jnp.minimum(state.db.write_pos, state.db.capacity)
            num_dists = jnp.sum(state.db.dist_block_iter >= 0) \
                * state.db.max_components
        elif isinstance(state.db, ShardedSampleDbState):
            db_size = jnp.sum(jnp.minimum(state.db.write_pos,
                                          state.db.capacity_local))
            num_dists = jnp.sum(state.db.dist_block_iter >= 0) \
                * state.db.max_components
        else:  # decimation-compatible DB
            db_size = state.db.count
            num_dists = state.db.dist_count
        return jnp.stack([
            state.db.num_samples_written.astype(jnp.float32),
            state.model.num_active.astype(jnp.float32),
            jnp.max(state.model.weights),
            db_size.astype(jnp.float32),
            num_dists.astype(jnp.float32),
        ])

    def get_cheap_metrics(self) -> dict:
        """(reference: gmmvi_runner.py:102-117); fetched with one device
        round-trip to keep per-iteration host latency low."""
        vals = np.asarray(self._cheap_metrics_device(self.gmmvi.state))
        return {
            "num_samples": int(vals[0]),
            "num_components": int(vals[1]),
            "max_weight": float(vals[2]),
            "num_db_samples": int(vals[3]),
            "num_db_components": int(vals[4]),
        }

    def get_expensive_metrics(self) -> dict:
        """(reference: gmmvi_runner.py:119-144)"""
        self._eval_key, key = jax.random.split(self._eval_key)
        model_state = self.gmmvi.state.model
        samples, entropy = self._samples_and_entropy(model_state, 2000, key)
        mean_reward = float(
            jnp.mean(self.target_distribution.log_density(samples))
        )
        entropy = float(entropy)
        elbo = mean_reward + self.gmmvi.temperature * entropy
        metrics = {
            "-elbo": -elbo,
            "entropy": entropy,
            "target_density": mean_reward,
            "algo_time": float(np.sum(self.wall_times)),
        }
        metrics.update(
            self.target_distribution.expensive_metrics(model_state, samples)
        )
        if self.mmd is not None:
            metrics["MMD"] = self.mmd.compute_MMD(samples)
        return metrics

    def iterate_and_log(self, n: int) -> dict:
        """(reference: gmmvi_runner.py:146-175)"""
        output = {}
        t0 = time.time()
        self.gmmvi.train_iter()
        # the step is dispatched asynchronously; block for honest walltime
        jax.block_until_ready(self.gmmvi.state.model.means)
        wall_time = time.time() - t0
        self.wall_times.append(wall_time)
        output["walltime"] = wall_time
        output.update(self.get_cheap_metrics())

        if n % self.log_metrics_interval == 0:
            eval_dict = self.get_expensive_metrics()
            print(
                "Checkpoint {:3d} | FEVALS: {:10d} | avg. sample logpdf: "
                "{:05.05f} | ELBO: {:05.05f}".format(
                    n, output["num_samples"], eval_dict["target_density"],
                    -eval_dict["-elbo"],
                )
            )
            print(f"{output['num_components']} components\n")
            output.update(eval_dict)
        return output

    # ------------------------------------------------------------------
    def log_to_disk(self, n: int) -> None:
        """npz model dumps (reference: gmmvi_runner.py:177-190)."""
        if not self.dump_gmms:
            return
        if n < 100 or n % 50 == 0:
            self._dump(os.path.join(self.dump_gmm_path, f"gmm_dump_{n}.npz"))

    def finalize(self) -> None:
        """(reference: gmmvi_runner.py:192-200)"""
        if self.dump_gmms:
            self._dump(os.path.join(self.dump_gmm_path, "final_gmm_dump.npz"))

    def _dump(self, path: str) -> None:
        model = self.gmmvi.state.model
        k = int(model.num_active)
        np.savez(
            path,
            weights=np.asarray(model.weights[:k]),
            means=np.asarray(model.means[:k]),
            covs=np.asarray(model.covs[:k]),
            timestamps=time.time(),
            fevals=int(self.gmmvi.state.db.num_samples_written),
        )

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        """Full-state checkpoint (model + meta + DB + RNG), resumable."""
        ckpt.save_state(path, self.gmmvi.state)

    def load_checkpoint(self, path: str) -> None:
        self.gmmvi.state = ckpt.load_state(path, self.gmmvi.state)
