"""End-to-end quality + speed check for the streaming kernels' matmul mode.

Runs SAMTRON stm300 on the attached TPU twice — whitening dots at f32
(Precision.HIGHEST) vs bf16x3 (3-pass split-operand emulation) — and
compares -ELBO trajectories and ms/iter.  The bf16x3 mode carries ~2^-16
relative error on the whitened values (vs f32's ~2^-24); this script is the
evidence for whether that is visible above MC noise on the reference's own
hardest bundled workload.

Run: python scripts/bench_matmul_mode_e2e.py [iters]
"""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gmmvi_tpu.configs import get_default_config
from gmmvi_tpu.runner import GmmviRunner
from gmmvi_tpu.ops import pallas_density as pd


def run(mode: str, iters: int, evals: tuple):
    pd.MATMUL_MODE = mode
    cfg = get_default_config("SAMTRON", "stm300")
    cfg.setdefault("model_initialization", {})
    runner = GmmviRunner.build_from_config(cfg)
    g = runner.gmmvi

    elbos = {}
    t_total = 0.0
    timed = 0
    done = 0
    for stop in evals:
        n = stop - done
        g.train_iters(1)  # compile outside the timed region on first block
        jax.block_until_ready(g.state.model.means)
        done += 1
        n -= 1
        if n > 0:
            t0 = time.perf_counter()
            g.train_iters(n)
            jax.block_until_ready(g.state.model.means)
            t_total += time.perf_counter() - t0
            timed += n
            done += n
        m = runner.get_expensive_metrics()
        elbos[done] = -m["-elbo"]
    return elbos, t_total / max(timed, 1) * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    evals = (20, 50, iters) if iters > 50 else (iters,)
    for mode in ("f32", "bf16x3"):
        elbos, ms = run(mode, iters, evals)
        print(f"{mode:7s}: elbo@{list(elbos)} = "
              f"{[round(v, 3) for v in elbos.values()]}  "
              f"steady-state {ms:.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
