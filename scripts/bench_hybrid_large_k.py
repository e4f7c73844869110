"""Hybrid ("data", "comp") mesh evidence at large K (virtual CPU mesh).

The hybrid mesh's stated purpose is large-K adaptive runs (the reference's
VIPS caps at max_components=1000): the per-component chains — trust-region
bisections, Cholesky reconstructions, estimator moments — are
embarrassingly parallel over K, and on a pure data mesh they are REPLICATED
on every device.

The forced-host virtual devices share one CPU's cores, so wall time tracks
TOTAL work across the mesh.  That makes comp-sharding directly visible: on
a 1-D data mesh the [K, D, D] chains run 8x (once per device); on a
("data", "comp") = (4, 2) mesh each device runs K/2, i.e. 4x total; on
(2, 4), 2x total.  If the comp-axis constraints work, large-K wall time
must DROP as comp shards grow — the opposite of what any collective
overhead would do.

Run: python scripts/bench_hybrid_large_k.py [K] [n_des]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(mesh, kmax, n_des):
    from __graft_entry__ import _build_gmmvi

    return _build_gmmvi(num_dimensions=16, n_des=n_des, kmax=kmax, k0=kmax,
                        mesh=mesh, seed=0)


def timeit(g, iters=4):
    for _ in range(2):
        g.train_iter()
    jax.block_until_ready(g.state.model.means)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            g.train_iter()
        jax.block_until_ready(g.state.model.means)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from jax.sharding import Mesh

    kmax = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_des = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    devices = np.asarray(jax.devices()[:8])
    meshes = {
        "data8": Mesh(devices.reshape(8), ("data",)),
        "data4xcomp2": Mesh(devices.reshape(4, 2), ("data", "comp")),
        "data2xcomp4": Mesh(devices.reshape(2, 4), ("data", "comp")),
    }
    results = {"kmax": kmax, "n_des": n_des, "ms_per_iter": {}}
    base = None
    for name, mesh in meshes.items():
        g = build(mesh, kmax, n_des)
        ms = timeit(g) * 1e3
        results["ms_per_iter"][name] = round(ms, 2)
        if base is None:
            base = ms
        print(f"{name:14s} {ms:8.2f} ms/iter   "
              f"(vs data8: {base / ms:.2f}x)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
