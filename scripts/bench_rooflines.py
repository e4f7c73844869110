"""Per-workload roofline audit: FLOPs, bytes, and which roof binds.

VERDICT r3 item 2: the flagship JSON line proves throughput but its shape
is dispatch-latency-bound by construction (1.67 GFLOP/step), so its MFU
says nothing about kernel quality.  This script measures, for the
workloads where FLOPs and bytes actually dominate:

1. whole-step ms/iter (scan-batched; donated state evolves, so the axon
   runtime cannot serve cached executions) with analytic FLOPs AND bytes
   models, achieved TFLOP/s and GB/s, and the binding roof;
2. the large-D density kernel (`fused_density_pack_large`) at the stm300
   window shape with EXACT flop/byte counts — the "% of roofline" answer
   for the hottest kernel.

Peaks are the v5e's (override: GMMVI_PEAK_TFLOPS_F32, GMMVI_PEAK_GBS).
All analytic models are itemized below; they count the padded shapes the
chip actually executes.

Run: python scripts/bench_rooflines.py [--quick]
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmvi_tpu.configs import get_default_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.optimization.gmmvi import GMMVI
from gmmvi_tpu.optimization import sample_selectors as sel_ops

PEAK_TFLOPS_F32 = float(os.environ.get("GMMVI_PEAK_TFLOPS_F32", 49.0))
PEAK_GBS = float(os.environ.get("GMMVI_PEAK_GBS", 819.0))


def step_model(g, codename: str) -> dict:
    """Analytic FLOPs and HBM bytes of one compiled step (padded shapes).

    FLOP terms (2 * MACs, matmul/contraction chains only):
      sampling        mu + L eps (component- or mixture-based)
      target eval     STM density + analytic grad: 2 passes of T_k*B*D^2
      density pack    whiten + precision-grad over the reuse window W
      background      old-dist whitening over W (reuse configs only)
      stein moments   sum_w r_kw (x_w - mu_k) g_w^T over W     [Stein]
      more gram       X^T W X over the triangular feature map  [MORE]
      weight update   post-update component-density pass over W
      trust region    ~trips * K * (chol + tri-solve + solve) D^3 [T only]

    Byte terms (f32): every [*, D]-sized array the streaming kernels read
    from or write to HBM, including the K-tiled kernels' x restreams
    (k_tiles * [D, W]) and the DB ring's dense rotate traffic (7x ring per
    written array — see sample_db._ring_range/splice).
    """
    st = g.state
    k = st.model.max_components
    d = st.model.num_dimensions
    n_des = g.selector_cfg.desired_samples_per_component
    batch = (k * n_des if g.selector_cfg.kind == "component-based" else n_des)
    w = sel_ops.total_window_size(g.selector_cfg, k)
    tgt_k = getattr(g.target_distribution, "target_means",
                    np.zeros((10, 1))).shape[0]
    u = min(g.selector_cfg.max_background_dists,
            st.db.ring_iters * k if hasattr(st.db, "ring_iters") else 2048)
    stein = g.estimator_type == "Stein"
    tr = g.updater_type == "trust-region"
    trips = 7 if tr else 0

    f = {
        "sampling": 2 * batch * d * d,
        "target_eval": 2 * 2 * tgt_k * batch * d * d,
        "density_pack": 2 * 2 * k * w * d * d,
        "background": 2 * u * w * d * d,
        "weight_update_density": 2 * k * w * d * d,
    }
    if stein:
        f["stein_moments"] = 2 * k * w * d * d + 2 * k * w * d
    else:
        nfeat = d * (d + 3) // 2 + 1
        f["more_gram"] = 2 * k * w * nfeat * 2  # X^T W X rank-1 stream
    if tr:
        f["trust_region"] = int(trips * k * (7.0 / 3.0) * d ** 3 * 2)
        f["tr_final"] = int(k * 3 * d ** 3 * 2 / 3)
    flops = sum(f.values())

    # bytes: kernel passes stream x^T [D, W] once per K-tile; outputs [K, W]
    from gmmvi_tpu.ops import pallas_density_large as pdl

    picked = pdl._pick_tiles(d) if d > 128 else None
    ktile = picked[0] if picked else 8
    k_tiles = -(-k // ktile)
    u_tiles = -(-u // ktile)
    xw = d * w * 4
    b = {
        "pack_x_restream": 2 * k_tiles * xw,      # density + grad pass
        "pack_outs": (2 * k * w + 2 * d * w) * 4,  # comp, resp-read, grads
        "background_x_restream": u_tiles * xw,
        "bg_dist_params": u * d * d * 4 * 2,
        "stein_reads": (2 * k * w + 2 * w * d) * 4,
        "weight_pass_x": k_tiles * xw,
        "db_ring_traffic": 7 * (w * d * 4 * 2 + w * 4 * 3) + batch * d * 4 * 26,
        "tr_matrices": (trips + 2) * k * d * d * 4 * 4,
        "target_params": 2 * tgt_k * d * d * 4,
    }
    bytes_ = sum(b.values())
    return dict(flops=flops, bytes=bytes_, flop_terms=f, byte_terms=b,
                batch=batch, window=w, k=k, d=d)


def run_workload(codename: str, experiment: str, iters: int,
                 kmax_pin: int = 64) -> dict:
    from gmmvi_tpu.configs import update_config

    cfg = get_default_config(codename, experiment)
    if cfg.get("num_component_adapter_type") == "adaptive":
        # pin the component capacity for the bench: the stm default adapter
        # cap is 1000 (padding everything to 1000 measures a different
        # workload), and un-pinned runs auto-repad mid-block, putting a
        # recompile inside the timed region.  The pins match the shapes the
        # per-workload tables have always reported (stm300: K_pad=40).
        cfg = update_config(cfg, {
            "num_component_adapter_config": {"max_components": kmax_pin},
            "tpu": {"max_components": kmax_pin}})
    target, model, meta = init_experiment(cfg)
    g = GMMVI.build_from_config(cfg, target, model, meta)
    g.train_iters(iters)
    jax.block_until_ready(g.state.model.means)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        g.train_iters(iters)
        jax.block_until_ready(g.state.model.means)
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    m = step_model(g, codename)
    sec = ms / 1e3
    tflops = m["flops"] / sec / 1e12
    gbs = m["bytes"] / sec / 1e9
    t_flop = m["flops"] / (PEAK_TFLOPS_F32 * 1e12)
    t_byte = m["bytes"] / (PEAK_GBS * 1e9)
    roof = max(t_flop, t_byte)
    return dict(
        workload=f"{codename}-{experiment}", ms_per_iter=round(ms, 2),
        analytic_gflops=round(m["flops"] / 1e9, 2),
        analytic_mbytes=round(m["bytes"] / 1e6, 1),
        achieved_tflops=round(tflops, 2), achieved_gbs=round(gbs, 1),
        flops_roof_ms=round(t_flop * 1e3, 3),
        bytes_roof_ms=round(t_byte * 1e3, 3),
        binding_roof="flops" if t_flop > t_byte else "bytes",
        pct_of_roofline=round(100 * roof / sec, 1),
    )


def density_kernel_roofline() -> dict:
    """The hottest kernel at the stm300 window shape, exact counts."""
    from gmmvi_tpu.ops import pallas_density_large as pdl

    k, d, w = 40, 300, 12032
    rng = np.random.RandomState(0)
    means = rng.randn(k, d).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32) * 0.1
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    chols = np.linalg.cholesky(covs).astype(np.float32)
    inv_chols = np.stack([np.linalg.inv(c) for c in chols])
    log_dets = np.sum(np.log(np.diagonal(chols, axis1=1, axis2=2)), -1)
    log_w = np.full((k,), -np.log(k), np.float32)
    xs = [jnp.asarray(rng.randn(w, d).astype(np.float32) * 3)
          for _ in range(4)]
    args = (jnp.asarray(means), jnp.asarray(inv_chols), jnp.asarray(log_w),
            jnp.asarray(log_dets.astype(np.float32)))

    # in-graph scan chaining: each call's input depends on the previous
    # call's output, timed as ONE device dispatch — per-call tunnel RTTs
    # inflated the naive per-call measurement ~4x on this remote-TPU setup
    reps = 16

    @jax.jit
    def scan_pack(x):
        def body(xc, _):
            comp, model, grads = pdl.fused_density_pack_large(*args, xc)
            return xc + 1e-6 * grads, jnp.sum(model)
        return jax.lax.scan(body, x, None, length=reps)[1]

    out = scan_pack(xs[0])
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = scan_pack(xs[0])
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)

    ktile, t = pdl._pick_tiles(d)
    k_pad = -(-k // ktile) * ktile
    w_pad = -(-w // t) * t
    flops = 2 * 2 * k_pad * w_pad * d * d        # two whitening passes
    k_tiles = k_pad // ktile
    bytes_ = (2 * k_tiles * d * w_pad * 4        # x restream per K-tile/pass
              + 2 * k_pad * d * d * 4            # W1/W2 blocks
              + (2 * k_pad * w_pad + 2 * d * w_pad) * 4)  # comp out+reread
    sec = best
    t_flop = flops / (PEAK_TFLOPS_F32 * 1e12)
    t_byte = bytes_ / (PEAK_GBS * 1e9)
    return dict(
        kernel="fused_density_pack_large",
        shape=f"K={k} D={d} W={w} (ktile={ktile}, t={t})",
        ms=round(sec * 1e3, 3),
        exact_gflops=round(flops / 1e9, 2), exact_mbytes=round(bytes_ / 1e6, 1),
        achieved_tflops=round(flops / sec / 1e12, 2),
        achieved_gbs=round(bytes_ / sec / 1e9, 1),
        flops_roof_ms=round(t_flop * 1e3, 3),
        bytes_roof_ms=round(t_byte * 1e3, 3),
        binding_roof="flops" if t_flop > t_byte else "bytes",
        pct_of_roofline=round(100 * max(t_flop, t_byte) / sec, 1),
        grid_steps=2 * k_tiles * (w_pad // t),
    )


def main():
    quick = "--quick" in sys.argv
    iters = 10 if quick else 20
    rows = []
    for codename, experiment, kmax_pin in (("SAMTRON", "stm20", 64),
                                           ("SAMTRON", "stm300", 40),
                                           ("SEPYFUX", "stm300", 40)):
        rows.append(run_workload(codename, experiment, iters,
                                 kmax_pin=kmax_pin))
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps(density_kernel_roofline()), flush=True)


if __name__ == "__main__":
    main()
