"""Custom (non-JAX) target distributions, as in the reference's
examples/4_gmmvi_runner_with_custom_environments.py: a numpy Rosenbrock target
with hand-coded gradients, run through the host-target escape hatch."""
import numpy as np

from gmmvi_tpu.configs import get_default_algorithm_config, update_config
from gmmvi_tpu.experiments.targets.lnpdf import LNPDF
from gmmvi_tpu.runner import GmmviRunner

import jax.numpy as jnp


class Rosenbrock(LNPDF):
    """Negative Rosenbrock as an unnormalized target, implemented in numpy.
    GMMVI cannot trace it, so use_log_density_and_grad=True supplies the
    gradients and safe_for_jit=False keeps evaluation on the host."""

    def __init__(self):
        super().__init__(use_log_density_and_grad=True, safe_for_jit=False)
        self.a, self.b = 1.0, 100.0

    def get_num_dimensions(self) -> int:
        return 2

    def log_density(self, samples):
        x = np.asarray(samples)[:, 0]
        y = np.asarray(samples)[:, 1]
        return jnp.asarray(
            -((self.a - x) ** 2 + self.b * (y - x**2) ** 2), jnp.float32
        )

    def log_density_and_grad(self, samples):
        x = np.asarray(samples)[:, 0]
        y = np.asarray(samples)[:, 1]
        ld = -((self.a - x) ** 2 + self.b * (y - x**2) ** 2)
        gx = -(-2 * (self.a - x) - 4 * self.b * (y - x**2) * x)
        gy = -(2 * self.b * (y - x**2))
        return (jnp.asarray(ld, jnp.float32),
                jnp.asarray(np.stack([gx, gy], 1), jnp.float32))


environment_config = {
    "target_fn": Rosenbrock(),
    "start_seed": 0,
    "environment_name": "Rosenbrock",
    "model_initialization": {
        "use_diagonal_covs": False,
        "num_initial_components": 1,
        "prior_mean": 0.0,
        "prior_scale": 1.0,
        "initial_cov": 1.0,
    },
    "gmmvi_runner_config": {"log_metrics_interval": 100},
    "use_sample_database": True,
    "max_database_size": int(1e6),
    "temperature": 1.0,
    "tpu": {"max_components": 32},
}

algorithm_config = get_default_algorithm_config("SAMTRUX")
merged_config = update_config(algorithm_config, environment_config)
runner = GmmviRunner.build_from_config(merged_config)

for n in range(500):
    runner.iterate_and_log(n)
