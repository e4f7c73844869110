"""Sweep (ktile, t) tile choices for the K-tiled streaming density kernels
at the stm300 shape, on the attached TPU.

Grid-step overhead is the dominant loss at large D (RESULTS_r04 rooflines):
the same pass at (ktile=8, t=128) takes 470 density grid steps where
(ktile=4, t=512) takes 240.  This sweep measures which tiling actually wins
on hardware (scan-chained — per-call readbacks inflate ~4x through the
remote-TPU tunnel).

Usage: python scripts/bench_tile_sweep.py [K D W]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmvi_tpu.ops import pallas_density_large as pdl


def bench(k, d, w, ktile, t, reps=16):
    if pdl._vmem_cost(d, ktile, t) > pdl._VMEM_BUDGET:
        return None
    if (ktile * d) % 8:
        return None
    pdl._TILE_OVERRIDE = (ktile, t)
    try:
        rng = np.random.RandomState(0)
        means = rng.randn(k, d).astype(np.float32)
        a = rng.randn(k, d, d).astype(np.float32) * 0.1
        covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
        chols = np.linalg.cholesky(covs).astype(np.float32)
        inv_chols = np.stack([np.linalg.inv(c) for c in chols])
        log_dets = np.sum(
            np.log(np.diagonal(chols, axis1=1, axis2=2)), -1).astype(
                np.float32)
        log_w = np.full((k,), -np.log(k), np.float32)
        args = (jnp.asarray(means), jnp.asarray(inv_chols),
                jnp.asarray(log_w), jnp.asarray(log_dets))
        x0 = jnp.asarray(rng.randn(w, d).astype(np.float32) * 3)

        @jax.jit
        def scan_pack(x):
            def body(xc, _):
                comp, model, grads = pdl.fused_density_pack_large(*args, xc)
                return xc + 1e-6 * grads, jnp.sum(model)
            return jax.lax.scan(body, x, None, length=reps)[1]

        out = scan_pack(x0)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = scan_pack(x0)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3
    finally:
        pdl._TILE_OVERRIDE = None


def compare_modes(k, d, w):
    """Speed + accuracy of the bf16x3 vs f32(HIGHEST) whitening dots."""
    from gmmvi_tpu.ops import pallas_density as pd

    rng = np.random.RandomState(0)
    means = rng.randn(k, d).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32) * 0.1
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    chols = np.linalg.cholesky(covs).astype(np.float32)
    inv_chols = np.stack([np.linalg.inv(c) for c in chols])
    log_dets = np.sum(
        np.log(np.diagonal(chols, axis1=1, axis2=2)), -1).astype(np.float32)
    log_w = np.full((k,), -np.log(k), np.float32)
    args = (jnp.asarray(means), jnp.asarray(inv_chols),
            jnp.asarray(log_w), jnp.asarray(log_dets))
    x0 = jnp.asarray(rng.randn(w, d).astype(np.float32) * 3)
    outs = {}
    for mode in ("f32", "bf16x3"):
        pd.MATMUL_MODE = mode
        reps = 16

        @jax.jit
        def scan_pack(x):
            def body(xc, _):
                comp, model, grads = pdl.fused_density_pack_large(*args, xc)
                return xc + 1e-6 * grads, jnp.sum(model)
            return jax.lax.scan(body, x, None, length=reps)[1]

        out = scan_pack(x0)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = scan_pack(x0)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        comp, model, grads = [
            np.asarray(v) for v in pdl.fused_density_pack_large(*args, x0)]
        outs[mode] = (best * 1e3, comp, model, grads)
        print(f"  {mode:7s}: {best * 1e3:7.3f} ms/pack")
    _, c1, m1, g1 = outs["f32"]
    _, c2, m2, g2 = outs["bf16x3"]
    print(f"  comp  max|diff| = {np.max(np.abs(c1 - c2)):.2e}  "
          f"(values ~{np.percentile(np.abs(c1), 50):.0f})")
    print(f"  model max|diff| = {np.max(np.abs(m1 - m2)):.2e}")
    print(f"  grads max|diff| = {np.max(np.abs(g1 - g2)):.2e}  "
          f"rel {np.max(np.abs(g1 - g2) / (np.abs(g1) + 1e-3)):.2e}")
    print(f"  speedup {outs['f32'][0] / outs['bf16x3'][0]:.2f}x")


def main():
    k, d, w = 40, 300, 12032
    if len(sys.argv) == 4:
        k, d, w = map(int, sys.argv[1:])
    print(f"K={k} D={d} W={w}  platform={jax.devices()[0].platform}")
    if "--modes" in sys.argv:
        compare_modes(k, d, w)
        return
    for ktile in (8, 4):
        for t in (512, 256, 128):
            ms = bench(k, d, w, ktile, t)
            if ms is None:
                print(f"  ktile={ktile} t={t:4d}: does not fit VMEM budget")
                continue
            kp = -(-k // ktile) * ktile
            steps = 2 * (kp // ktile) * (-(-w // t))
            print(f"  ktile={ktile} t={t:4d}: {ms:7.3f} ms  "
                  f"(grid steps/pack={steps})")


if __name__ == "__main__":
    main()
