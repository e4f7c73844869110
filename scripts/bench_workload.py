"""Time one workload's full training step on the attached TPU.

Usage: python scripts/bench_workload.py [CODENAME] [EXPERIMENT] [ITERS]

Builds the optimizer from the same YAML configs the reference uses
(reference: examples/2_using_the_gmmvi_runner.py pattern), scan-batches
ITERS training iterations into one device dispatch (so tunnel latency
cancels), and reports ms/iter.
"""
from __future__ import annotations

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmvi_tpu.configs import get_default_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.optimization.gmmvi import GMMVI


def main():
    codename = sys.argv[1] if len(sys.argv) > 1 else "SEPYFUX"
    experiment = sys.argv[2] if len(sys.argv) > 2 else "stm300"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    config = get_default_config(codename, experiment)
    target, model, meta = init_experiment(config)
    gmmvi = GMMVI.build_from_config(config, target, model, meta)

    gmmvi.train_iters(iters)  # warmup / compile
    jax.block_until_ready(gmmvi.state.model.means)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        gmmvi.train_iters(iters)
        jax.block_until_ready(gmmvi.state.model.means)
        best = min(best, time.perf_counter() - t0)

    ms = best / iters * 1e3
    print(f"{codename} {experiment}: {ms:.2f} ms/iter "
          f"(best of 3 blocks of {iters})")


if __name__ == "__main__":
    main()
