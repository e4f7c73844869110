"""Train through the GmmviRunner (metrics + logging), as in the reference's
examples/2_using_the_gmmvi_runner.py."""
import os

from gmmvi_tpu.configs import load_yaml
from gmmvi_tpu.runner import GmmviRunner

my_path = os.path.dirname(os.path.realpath(__file__))
config = load_yaml(os.path.join(my_path, "example_config.yml"))
runner = GmmviRunner.build_from_config(config)

for n in range(10001):
    runner.iterate_and_log(n)
