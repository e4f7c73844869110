"""Probe: actual bisection trip counts and per-trip cost at stm300 shapes.

The microbench says one whitened trip body costs ~16 us at [40,300,300],
yet the in-workload TR marginal is ~25 ms.  Count real trips and measure
forced-trip-count scaling to find where the time goes.
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

from gmmvi_tpu.optimization import component_updaters as cu


def timeit(fn, *args, reps=10):
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


def search_with_count(kl_fn, kl_bound, lower0, upper0):
    """Copy of _bracketing_search that also returns the trip count."""
    def cond(carry):
        _, _, _, done, it = carry
        return jnp.logical_and(jnp.logical_not(done), it < 1000)

    def body(carry):
        lower, upper, upper_ok, done, it = carry
        eta = 0.5 * (lower + upper)
        kl = kl_fn(jnp.exp(eta))[0]
        diff = jnp.minimum(jnp.exp(upper) - jnp.exp(eta),
                           jnp.exp(eta) - jnp.exp(lower))
        stop_width = diff < 1e-1
        good = jnp.abs(kl_bound - kl) < 1e-1 * kl_bound
        go_low = kl_bound > kl
        lower = jnp.where(stop_width, lower,
                          jnp.where(good, eta, jnp.where(go_low, lower, eta)))
        upper = jnp.where(stop_width, upper,
                          jnp.where(good, eta, jnp.where(go_low, eta, upper)))
        upper_ok = jnp.where(jnp.logical_and(~stop_width, ~good),
                             jnp.logical_or(upper_ok, go_low), upper_ok)
        done = jnp.logical_or(stop_width, good)
        return lower, upper, upper_ok, done, it + 1

    lower, upper, upper_ok, done, it = jax.lax.while_loop(
        cond, body,
        (lower0, upper0, jnp.asarray(False), jnp.asarray(False),
         jnp.asarray(0, jnp.int32)))
    return it


def forced_trips(kl_fn_batched, n_trips, lower0, upper0):
    """Run exactly n_trips batched KL evals in a dependent chain."""
    def body(i, carry):
        lower, upper, acc = carry
        eta = 0.5 * (lower + upper)
        kl = kl_fn_batched(jnp.exp(eta))
        go_low = kl < 1.0
        lower = jnp.where(go_low, lower, eta)
        upper = jnp.where(go_low, eta, upper)
        return lower, upper, acc + jnp.sum(kl * 0.0)

    lower, upper, acc = jax.lax.fori_loop(
        0, n_trips, body, (lower0, upper0, jnp.float32(0)))
    return lower + acc


def main():
    d, k = 300, 40
    rng = np.random.RandomState(0)
    a = rng.randn(k, d, d).astype(np.float32) * 0.05
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    chols = np.linalg.cholesky(covs)
    inv_chols = np.stack([np.linalg.inv(c) for c in chols])
    means = rng.randn(k, d).astype(np.float32)
    hneg = np.einsum("kij,klj->kil",
                     rng.randn(k, d, d).astype(np.float32) * 0.02,
                     rng.randn(k, d, d).astype(np.float32) * 0.02)
    hneg = (hneg + 0.1 * np.eye(d, dtype=np.float32)).astype(np.float32)
    gneg = (rng.randn(k, d) * 0.1).astype(np.float32)
    reward_quad = jnp.asarray(hneg)
    reward_lin = jnp.einsum("kij,kj->ki", reward_quad, jnp.asarray(means)) \
        - jnp.asarray(gneg)

    mw, cw, b1 = jax.vmap(cu._tr_whitened_precompute)(
        jnp.asarray(means), jnp.asarray(chols), jnp.asarray(inv_chols),
        reward_lin, reward_quad)

    eps = jnp.full((k,), 0.05, jnp.float32)

    # 1. actual trip counts, cold and warm
    @jax.jit
    def counts(lower0, upper0):
        return jax.vmap(
            lambda m, c, b, lo, up, e: search_with_count(
                partial(cu._tr_kl_whitened_trip, m_w=m, c=c, b1=b), e, lo, up)
        )(mw, cw, b1, lower0, upper0, eps)

    cold_lo = jnp.full((k,), -20.0)
    cold_up = jnp.full((k,), 80.0)
    it_cold = np.asarray(counts(cold_lo, cold_up))
    print(f"cold trips: min={it_cold.min()} max={it_cold.max()} "
          f"mean={it_cold.mean():.1f}")

    # 2. forced-trip scaling: dependent-chain per-trip cost
    def kl_batched(etas):
        return jax.vmap(
            lambda e, m, c, b: cu._tr_kl_whitened_trip(e, m, c, b)[0]
        )(etas, mw, cw, b1)

    for n in (8, 32, 128):
        f = jax.jit(partial(forced_trips, kl_batched, n))
        ms = timeit(f, cold_lo, cold_up)
        print(f"forced {n:4d} trips: {ms:8.3f} ms  ({ms / n * 1e3:.1f} us/trip)")

    # 3. the real updater, for scale
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.models import meta as M
    model = G.create_gmm_state(np.ones(k, np.float32) / k, means, covs,
                               max_components=k)
    meta = M.create_meta_state(model, initial_stepsize=0.05,
                               initial_regularizer=1e-12,
                               max_reward_history_length=4)
    upd = jax.jit(lambda mo, me: cu.trust_region_update(
        mo, me, reward_quad, jnp.asarray(gneg), me.stepsizes))
    print(f"trust_region_update (cold):      {timeit(upd, model, meta, reps=5):8.3f} ms")


if __name__ == "__main__":
    main()
