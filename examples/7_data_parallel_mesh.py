"""Data-parallel training over a device mesh.

Shards the per-iteration sample batch over all visible devices; model and
optimizer state stay replicated and the per-component sufficient statistics
reduce over the mesh (psum over ICI on a TPU slice).  On a multi-host pod,
``initialize_distributed()`` first.

Without accelerators, simulate devices:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/7_data_parallel_mesh.py
"""
import jax

from gmmvi_tpu.configs import get_default_algorithm_config, update_config
from gmmvi_tpu.experiments.targets.student_t_mixture import make_target
from gmmvi_tpu.parallel.mesh import data_mesh, initialize_distributed
from gmmvi_tpu.runner import GmmviRunner

initialize_distributed()  # no-op on a single host
mesh = data_mesh()
print(f"mesh: {mesh.shape} over {len(jax.devices())} devices")

n_dev = len(jax.devices())
config = update_config(get_default_algorithm_config("SAMTRON"), {
    "start_seed": 0,
    "target_fn": make_target(num_dimensions=20, harder_setting=False, seed=0),
    "environment_name": "stm20",
    "model_initialization": {
        "use_diagonal_covs": False, "num_initial_components": 16,
        "prior_mean": 0.0, "prior_scale": 100.0, "initial_cov": 300.0,
    },
    "use_sample_database": True, "max_database_size": 10_000_000,
    "temperature": 1.0,
    # keep the sharded axis divisible by the mesh
    "sample_selector_config": {
        "desired_samples_per_component": 16 * n_dev,
        "ratio_reused_samples_to_desired": 0.0,
    },
    "num_component_adapter_config": {
        "del_iters": 100, "add_iters": 60, "max_components": 32,
        "thresholds_for_add_heuristic": [5000.0, 1000.0, 500.0],
        "min_weight_for_del_heuristic": 1e-6,
        "num_database_samples": 1024, "num_prior_samples": 0,
    },
    "component_stepsize_adapter_config": {
        "initial_stepsize": 0.1, "min_stepsize": 0.001, "max_stepsize": 1.0,
    },
    "gmmvi_runner_config": {"log_metrics_interval": 25},
    "tpu": {"max_components": 32},
})

runner = GmmviRunner.build_from_config(config, mesh=mesh)
for n in range(101):
    runner.iterate_and_log(n)
