"""Measure the stm300 trust-region bisection's cost structure on the TPU.

The SAMTRON stm300 step spends ~30 of ~76 ms in ~7 lockstep bisection trips
of batched [40, 300, 300] Cholesky chains (RESULTS_r03 §6).  Before building
a large-D kernel or a speculative multi-eta wave, measure what actually
binds:

1. the whitened per-trip KL (chol + triangular inversion + cho_solve) at
   batch K=40 — the current trip body;
2. batched Cholesky alone at B = 40 / 120 / 280 — if time is near-flat in B,
   the factorization is latency-bound (sequential column loop) and a
   speculative wave (3 or 7 etas per component per trip, exact bisection
   replay) cuts trips ~2-3x nearly for free;
3. chol + the trace triangular-inversion at the same batches (the full wave
   body);
4. batched eigh at [40, 300, 300] — the one-shot spectral alternative
   (measured 2x worse end-to-end in r2; kept for the record);
5. the full SAMTRON stm300 bracket search end to end via the real updater.

Usage: python scripts/bench_tr_large_d.py [D] [K]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    rng = np.random.RandomState(0)

    def spd(b):
        a = rng.randn(b, d, d).astype(np.float32) * 0.1
        return jnp.asarray(
            np.einsum("bij,blj->bil", a, a) + np.eye(d, dtype=np.float32))

    m40 = spd(k)
    c_vec = jnp.asarray(rng.randn(k, d).astype(np.float32))
    b_vec = jnp.asarray(rng.randn(k, d).astype(np.float32))

    @jax.jit
    def whitened_trip(m, c, b1):
        from gmmvi_tpu.optimization.component_updaters import (
            _tr_kl_whitened_trip)

        return jax.vmap(partial(_tr_kl_whitened_trip, eta=2.0))(
            m_w=m, c=c, b1=b1)[0]

    @partial(jax.jit, static_argnames=())
    def chol_only(m):
        return jnp.linalg.cholesky(m)

    @jax.jit
    def chol_plus_trace(m):
        lc = jnp.linalg.cholesky(m)
        eye = jnp.eye(d, dtype=jnp.float32)
        inv = jax.vmap(
            lambda L: jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        )(lc)
        return jnp.sum(jnp.square(inv), axis=(1, 2))

    @jax.jit
    def eigh_only(m):
        return jnp.linalg.eigh(m)[0]

    print(f"D={d} K={k} on {jax.devices()[0].platform}")
    print(f"whitened trip body (chol+inv+solve) B={k}: "
          f"{timeit(whitened_trip, m40, c_vec, b_vec):8.3f} ms")
    for b in (k, 3 * k, 7 * k):
        m = spd(b)
        print(f"cholesky              B={b:4d}: {timeit(chol_only, m):8.3f} ms")
    for b in (k, 3 * k, 7 * k):
        m = spd(b)
        print(f"chol + trace tri-inv  B={b:4d}: "
              f"{timeit(chol_plus_trace, m):8.3f} ms")
    if os.environ.get("GMMVI_BENCH_EIGH", "0") == "1":  # minutes-slow; known 2x-worse
        print(f"eigh                  B={k:4d}: {timeit(eigh_only, m40, reps=3):8.3f} ms")

    # 5. the real updater end to end at the stm300 shape
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.models import meta as M
    from gmmvi_tpu.optimization.component_updaters import trust_region_update

    means = rng.randn(k, d).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32) * 0.05
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    model = G.create_gmm_state(np.ones(k, np.float32) / k, means, covs,
                               max_components=k)
    meta = M.create_meta_state(model, initial_stepsize=0.05,
                               initial_regularizer=1e-12,
                               max_reward_history_length=4)
    hneg = np.einsum("kij,klj->kil",
                     rng.randn(k, d, d).astype(np.float32) * 0.02,
                     rng.randn(k, d, d).astype(np.float32) * 0.02)
    hneg = jnp.asarray(hneg + 0.1 * np.eye(d, dtype=np.float32))
    gneg = jnp.asarray(rng.randn(k, d).astype(np.float32) * 0.1)

    upd = jax.jit(lambda mo, me: trust_region_update(
        mo, me, hneg, gneg, me.stepsizes))
    # cold start (no warm etas): wide bracket, many trips
    t_cold = timeit(lambda: upd(model, meta), reps=5)
    out_model, out_meta = upd(model, meta)
    # warm: rerun with the found etas as warm starts (steady-state trips)
    meta_w = meta.replace(last_etas=out_meta.last_etas)
    t_warm = timeit(lambda: upd(model, meta_w), reps=5)
    print(f"trust_region_update cold bracket: {t_cold:8.3f} ms")
    print(f"trust_region_update warm bracket: {t_warm:8.3f} ms")


if __name__ == "__main__":
    main()
