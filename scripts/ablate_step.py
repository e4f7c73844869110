"""Ablation timing of the flagship training step on the attached TPU.

Builds cumulative-prefix programs of the training iteration and times each,
so the marginal cost of every phase is visible.  Each prefix is timed as a
``lax.scan`` over ``ITERS`` iterations inside ONE device dispatch — per-call
host/tunnel latency (~1 ms here) would otherwise swamp the sub-millisecond
marginals.  Fresh PRNG keys are threaded through the scan carry and every
phase output is folded into a live accumulator, so XLA can neither hoist the
loop body nor dead-code-eliminate the phase under test.

XLA dead-code-eliminates whatever the returned values don't need, so each
program only contains the phases up to its cut point.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _build_gmmvi
from gmmvi_tpu.optimization import sample_selectors as sel_ops
from gmmvi_tpu.optimization import ng_estimators as est_ops
from gmmvi_tpu.optimization import weight_updaters as w_ops
from gmmvi_tpu.optimization import component_updaters as upd_ops

ITERS = 50


def _tree_sum(x) -> jnp.ndarray:
    leaves = [
        jnp.sum(l.astype(jnp.float32))
        for l in jax.tree_util.tree_leaves(x)
        if jnp.issubdtype(jnp.asarray(l).dtype, jnp.number)
    ]
    return sum(leaves, jnp.float32(0))


def scan_timeit(phase_fn, state, iters=ITERS, reps=5):
    """ms per iteration of ``phase_fn(state_with_fresh_key) -> outputs``."""

    def step(carry, _):
        key, acc = carry
        key, sub = jax.random.split(key)
        out = phase_fn(state.replace(key=sub))
        return (key, acc + _tree_sum(out)), None

    @jax.jit
    def run(key):
        (key, acc), _ = jax.lax.scan(
            step, (key, jnp.float32(0)), None, length=iters)
        return acc

    key = jax.random.PRNGKey(7)
    run(key).block_until_ready()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(key).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3  # ms


def main():
    g = _build_gmmvi(num_dimensions=20, n_des=200, kmax=48, k0=45, seed=0)
    # run a few real steps so the state is in a steady regime
    g.train_iters(5)
    state = g.state

    def phase_propose(state):
        state, prop = g._propose_phase(state)
        return prop.samples, prop.valid

    def phase_eval(state):
        state, prop = g._propose_phase(state)
        lnpdfs, grads = g._eval_target_bucketed(prop.samples, prop.valid)
        return lnpdfs, grads

    def _window(state):
        state, prop = g._propose_phase(state)
        lnpdfs, grads = g._eval_target_bucketed(prop.samples, prop.valid)
        key, k_db, k_adapt = jax.random.split(state.key, 3)
        db, window, pack = sel_ops.finalize_fused(
            state.model, state.db, g.selector_cfg, state.num_updates, prop,
            lnpdfs, grads, k_db)
        return state, db, window, pack

    def phase_finalize(state):
        state, db, window, pack = _window(state)
        return window.background_log_pdfs, window.valid

    def _estimate(state):
        state, db, window, pack = _window(state)
        est = est_ops.stein_estimate(
            state.model, window.samples, window.valid, window.mapping,
            window.background_log_pdfs, window.target_lnpdfs,
            window.target_grads,
            pack=pack, newest_mask=window.newest_mask)
        return state, window, est

    def phase_stein(state):
        state, window, est = _estimate(state)
        return est.expected_hessians_neg, est.expected_gradients_neg

    def _updated(state):
        state, window, est = _estimate(state)
        model, meta = upd_ops.UPDATERS["trust-region"](
            state.model, state.meta, est.expected_hessians_neg,
            est.expected_gradients_neg, state.meta.stepsizes,
            temperature=g.temperature, search="bracket", grid_size=32)
        return state, window, model, meta

    def phase_compupd(state):
        state, window, model, meta = _updated(state)
        return model.means, model.chols

    def phase_weights(state):
        state, window, model, meta = _updated(state)
        elr, meta = w_ops.expected_log_ratios(
            model, meta, window.samples, window.valid,
            window.background_log_pdfs, window.target_lnpdfs,
            g.temperature, True)
        model, meta = w_ops.trust_region_weight_update(
            model, meta, elr, state.wstep.stepsize, g.temperature)
        return model.log_weights, meta.reward_history

    def phase_full(state):
        return g._full_step(state)

    phases = [
        ("propose (sampling + ESS)", phase_propose),
        ("+ target eval (grad)", phase_eval),
        ("+ finalize (db add + background)", phase_finalize),
        ("+ stein estimate", phase_stein),
        ("+ component TR update", phase_compupd),
        ("+ weight update", phase_weights),
        ("full step (incl. adaptation)", phase_full),
    ]
    prev = 0.0
    for name, fn in phases:
        ms = scan_timeit(fn, state)
        print(f"{name:36s} {ms:7.3f} ms  (marginal {ms - prev:+.3f})")
        prev = ms


if __name__ == "__main__":
    main()
