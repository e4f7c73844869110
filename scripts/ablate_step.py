"""Ablation timing of the flagship training step on the attached TPU.

Builds cumulative-prefix programs of the training iteration and times each,
so the marginal cost of every phase is visible.  XLA dead-code-eliminates
whatever the returned values don't need, so each program only contains the
phases up to its cut point.
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
from gmmvi_tpu.optimization import stepsize_adapters as step_ops
from gmmvi_tpu.optimization import component_updaters as upd_ops


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    g = _build_gmmvi(num_dimensions=20, n_des=200, kmax=48, k0=45, seed=0)
    # run a few real steps so the state is in a steady regime
    for _ in range(3):
        g.train_iter()
    state = g.state

    def phase_propose(state):
        state, prop = g._propose_phase(state)
        return prop.samples, prop.valid

    def phase_eval(state):
        state, prop = g._propose_phase(state)
        lnpdfs, grads = g._eval_target(prop.samples)
        return lnpdfs, grads

    def phase_finalize(state):
        state, prop = g._propose_phase(state)
        lnpdfs, grads = g._eval_target(prop.samples)
        key, k_db, k_adapt = jax.random.split(state.key, 3)
        db, window = sel_ops.finalize(
            state.model, state.db, g.selector_cfg, state.num_updates, prop,
            lnpdfs, grads, k_db)
        return window.background_log_pdfs, window.valid

    def _window(state):
        state, prop = g._propose_phase(state)
        lnpdfs, grads = g._eval_target(prop.samples)
        key, k_db, k_adapt = jax.random.split(state.key, 3)
        db, window = sel_ops.finalize(
            state.model, state.db, g.selector_cfg, state.num_updates, prop,
            lnpdfs, grads, k_db)
        return state, db, window

    def phase_stein(state):
        state, db, window = _window(state)
        est = est_ops.stein_estimate(
            state.model, window.samples, window.valid, window.mapping,
            window.background_log_pdfs, window.target_lnpdfs,
            window.target_grads)
        return est.expected_hessians_neg, est.expected_gradients_neg

    def phase_compupd(state):
        state, db, window = _window(state)
        est = est_ops.stein_estimate(
            state.model, window.samples, window.valid, window.mapping,
            window.background_log_pdfs, window.target_lnpdfs,
            window.target_grads)
        model, meta = upd_ops.UPDATERS["trust-region"](
            state.model, state.meta, est.expected_hessians_neg,
            est.expected_gradients_neg, state.meta.stepsizes,
            temperature=g.temperature, search="bracket", grid_size=32)
        return model.means, model.chols

    def phase_weights(state):
        state, db, window = _window(state)
        est = est_ops.stein_estimate(
            state.model, window.samples, window.valid, window.mapping,
            window.background_log_pdfs, window.target_lnpdfs,
            window.target_grads)
        model, meta = upd_ops.UPDATERS["trust-region"](
            state.model, state.meta, est.expected_hessians_neg,
            est.expected_gradients_neg, state.meta.stepsizes,
            temperature=g.temperature, search="bracket", grid_size=32)
        elr, meta = w_ops.expected_log_ratios(
            model, meta, window.samples, window.valid,
            window.background_log_pdfs, window.target_lnpdfs,
            g.temperature, True)
        model, meta = w_ops.trust_region_weight_update(
            model, meta, elr, state.wstep.stepsize, g.temperature)
        return model.log_weights, meta.reward_history

    # note: g._jitted_step donates its argument, so time a fresh non-donating
    # jit of the same function (re-calling the donated one with a consumed
    # state is an error)
    full = jax.jit(g._full_step)

    phases = [
        ("propose (sampling)", jax.jit(phase_propose)),
        ("+ target eval (grad)", jax.jit(phase_eval)),
        ("+ finalize (db add + background)", jax.jit(phase_finalize)),
        ("+ stein estimate", jax.jit(phase_stein)),
        ("+ component TR update", jax.jit(phase_compupd)),
        ("+ weight update", jax.jit(phase_weights)),
    ]
    prev = 0.0
    for name, fn in phases:
        ms = timeit(fn, state)
        print(f"{name:36s} {ms:7.3f} ms  (marginal {ms - prev:+.3f})")
        prev = ms
    ms = timeit(lambda s: full(s).model.means, state)
    print(f"{'full step (donated)':36s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()
