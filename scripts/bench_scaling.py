"""Data-parallel sharding-overhead measurement on a virtual CPU mesh.

Real multi-chip hardware is not available in this environment, and the
forced-host virtual devices all share one CPU's cores — so *speedup* cannot
be observed here (total compute capacity is constant regardless of device
count).  What this does measure is the **overhead of the sharded program**:
the same compiled training step with the sample batch partitioned over N
virtual devices vs the unsharded step.  Low overhead + the bitwise
equivalence tests in tests/test_sharding.py are the evidence that the
partitioning/collective structure is sound; actual scaling efficiency needs
pod hardware (BASELINE.md's >=80% 1-chip -> 2-host target).

Run: python scripts/bench_scaling.py
"""
import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")


def build(mesh, n_des):
    from __graft_entry__ import _build_gmmvi

    return _build_gmmvi(num_dimensions=32, n_des=n_des, kmax=16, k0=8,
                        mesh=mesh, seed=0)


def timeit(g, iters=6):
    for _ in range(2):
        g.train_iter()
    jax.block_until_ready(g.state.model.means)
    t0 = time.perf_counter()
    for _ in range(iters):
        g.train_iter()
    jax.block_until_ready(g.state.model.means)
    return (time.perf_counter() - t0) / iters


def main():
    from jax.sharding import Mesh

    n_des = 512  # 16 * 512 = 8192 samples/iter in 32-D
    devices = jax.devices()
    results = {}
    for n_dev in [1, 8]:
        if n_dev > len(devices):
            break
        mesh = Mesh(np.asarray(devices[:n_dev]).reshape(n_dev), ("data",))
        g = build(mesh if n_dev > 1 else None, n_des)
        dt = timeit(g)
        results[n_dev] = dt
        base = results[1]
        print(json.dumps({
            "devices": n_dev,
            "ms_per_iter": round(dt * 1e3, 2),
            "sharding_overhead_vs_1dev": round(dt / base - 1.0, 3),
        }))


if __name__ == "__main__":
    main()
