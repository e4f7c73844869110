"""Humanoid inverse kinematics: the 34-DoF Talos posterior.

Reproduces the reference's Talos experiment (talos.yml + talos_ik.py) with
the bundled URDF — but fully JAX-native: the forward-kinematics chain and
the mixture-of-experts reward compile into the training step, so the target
runs on the TPU instead of eagerly on the host (the reference must set
``safe_for_tf_graph=False``).

The mixture discovers multiple IK solutions that place the left gripper at
``context`` while keeping both feet planted and the CoM over the support.
"""
from gmmvi_tpu.configs import get_default_config, update_config
from gmmvi_tpu.runner import GmmviRunner

config = get_default_config("SAMTRON", "talos")
config = update_config(config, {
    # the reference runs with the defaults in talos.yml; a couple of
    # conveniences for an interactive demo:
    "gmmvi_runner_config": {"log_metrics_interval": 50},
    "tpu": {"max_components": 32},
})

runner = GmmviRunner.build_from_config(config)
for n in range(500):
    runner.iterate_and_log(n)
