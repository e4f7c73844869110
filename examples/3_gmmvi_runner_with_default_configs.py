"""Assemble a run from codename + experiment defaults, as in the reference's
examples/3_gmmvi_runner_with_default_configs.py (SAMYROX on gmm20)."""
import gmmvi_tpu.configs as configs
from gmmvi_tpu.runner import GmmviRunner

algorithm_config = configs.get_default_algorithm_config("SAMYROX")

# The per-slot defaults are chosen independently; as the reference's example
# notes, the improvement-based initial stepsize suits trust-region updates
# ("T"), not direct/iBLR steps ("I"/"Y") — override for SAMYROX:
algorithm_config = configs.update_config(algorithm_config, {
    "component_stepsize_adapter_config": {
        "initial_stepsize": 0.0001,
        "min_stepsize": 0.0001,
        "max_stepsize": 0.001,
    }
})

environment_config = configs.get_default_experiment_config("gmm20")
config = configs.update_config(algorithm_config, environment_config)

runner = GmmviRunner.build_from_config(config)
for n in range(1500):
    runner.iterate_and_log(n)
