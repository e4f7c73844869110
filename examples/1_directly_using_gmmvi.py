"""Directly drive the GMMVI optimizer (no runner), as in the reference's
examples/1_directly_using_gmmvi.py: build a target, an initial model and a
GMMVI instance from a config, then call train_iter() yourself."""
import os

import jax
import jax.numpy as jnp

from gmmvi_tpu.configs import load_yaml
from gmmvi_tpu.experiments.setup import construct_initial_mixture
from gmmvi_tpu.experiments.targets.logistic_regression import make_breast_cancer
from gmmvi_tpu.models import gmm as gmm_ops
from gmmvi_tpu.models import meta as meta_ops
from gmmvi_tpu.optimization.gmmvi import GMMVI

my_path = os.path.dirname(os.path.realpath(__file__))
config = load_yaml(os.path.join(my_path, "example_config.yml"))

# 1. a target distribution
target_distribution = make_breast_cancer()

# 2. an initial (padded) model + meta-state
dims = target_distribution.get_num_dimensions()
model = construct_initial_mixture(
    num_dimensions=dims, num_initial_components=1, prior_mean=0.0,
    prior_scale=10.0, use_diagonal_covs=False, initial_cov=100.0,
    max_components=config["tpu"]["max_components"],
)
meta = meta_ops.create_meta_state(
    model,
    initial_stepsize=config["component_stepsize_adapter_config"][
        "initial_stepsize"],
    initial_regularizer=1e-12,
    max_reward_history_length=meta_ops.history_length_from_config(config),
)

# 3. the optimizer
gmmvi = GMMVI.build_from_config(config, target_distribution, model, meta)

max_iter = 1001
for n in range(max_iter):
    gmmvi.train_iter()
    if n % 100 == 0:
        state = gmmvi.state.model
        samples, _ = gmm_ops.sample(state, jax.random.PRNGKey(n), 1000)
        elbo = float(jnp.mean(
            target_distribution.log_density(samples)
            - gmm_ops.log_density(state, samples)
        ))
        print(f"{n}/{max_iter}: {int(state.num_active)} components, "
              f"elbo {elbo:.3f}")
