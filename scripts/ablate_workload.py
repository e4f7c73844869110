"""Generic phase ablation of the training step for any (codename, experiment).

Usage: python scripts/ablate_workload.py [CODENAME] [EXPERIMENT] [ITERS]

Same cumulative-prefix methodology as ablate_step.py (scan-batched so tunnel
dispatch latency cancels; live accumulators defeat DCE) but built from the
YAML config path, so any workload can be attributed.

Known limit: very large programs (e.g. adaptive SAMTRON at D=300 with a
100k-sample DB) can exceed the axon remote-compile request size (HTTP 413);
use a smaller max_database_size override or time sub-phases directly in
that regime.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmvi_tpu.configs import get_default_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.optimization.gmmvi import GMMVI
from gmmvi_tpu.optimization import sample_selectors as sel_ops


def _tree_sum(x) -> jnp.ndarray:
    leaves = [
        jnp.sum(l.astype(jnp.float32))
        for l in jax.tree_util.tree_leaves(x)
        if jnp.issubdtype(jnp.asarray(l).dtype, jnp.number)
    ]
    return sum(leaves, jnp.float32(0))


def scan_timeit(phase_fn, state, iters, reps=4):
    # state rides as an ARGUMENT: closure-capturing it embeds the whole DB
    # (hundreds of MB at stm300) as HLO constants, blowing past the axon
    # remote-compile request limit (HTTP 413)
    @jax.jit
    def run(key, st):
        def step(carry, _):
            key, acc = carry
            key, sub = jax.random.split(key)
            out = phase_fn(st.replace(key=sub))
            return (key, acc + _tree_sum(out)), None

        (key, acc), _ = jax.lax.scan(
            step, (key, jnp.float32(0)), None, length=iters)
        return acc

    key = jax.random.PRNGKey(7)
    run(key, state).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(key, state).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    codename = sys.argv[1] if len(sys.argv) > 1 else "SEPYFUX"
    experiment = sys.argv[2] if len(sys.argv) > 2 else "stm300"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    config = get_default_config(codename, experiment)
    target, model, meta = init_experiment(config)
    g = GMMVI.build_from_config(config, target, model, meta)
    g.train_iters(5)
    state = g.state

    def phase_propose(state):
        state, prop = g._propose_phase(state)
        return prop.samples, prop.valid

    def phase_eval(state):
        state, prop = g._propose_phase(state)
        return g._eval_target_bucketed(prop.samples, prop.valid)

    def phase_finalize(state):
        state, prop = g._propose_phase(state)
        lnpdfs, grads = g._eval_target_bucketed(prop.samples, prop.valid)
        key, k_db, _ = jax.random.split(state.key, 3)
        db, window, pack = sel_ops.finalize_fused(
            state.model, state.db, g.selector_cfg, state.num_updates, prop,
            lnpdfs, grads, k_db)
        return window.background_log_pdfs, window.valid

    def phase_updates(state):
        state, prop = g._propose_phase(state)
        lnpdfs, grads = g._eval_target_bucketed(prop.samples, prop.valid)
        key, k_db, _ = jax.random.split(state.key, 3)
        db, window, pack = sel_ops.finalize_fused(
            state.model, state.db, g.selector_cfg, state.num_updates, prop,
            lnpdfs, grads, k_db)
        model, meta2, wstep = g._run_updates(state.model, state.meta,
                                             state.wstep, window, pack)
        return model.means, model.chols, model.log_weights

    def phase_full(state):
        return g._full_step(state)

    phases = [
        ("propose (sampling + ESS)", phase_propose),
        ("+ target eval", phase_eval),
        ("+ finalize (db + background + pack)", phase_finalize),
        ("+ run_updates (est + comp + weights)", phase_updates),
        ("full step (incl. adaptation)", phase_full),
    ]
    prev = 0.0
    print(f"{codename} {experiment} (scan x{iters}):")
    for name, fn in phases:
        ms = scan_timeit(fn, state, iters)
        print(f"  {name:42s} {ms:7.3f} ms  (marginal {ms - prev:+7.3f})")
        prev = ms


if __name__ == "__main__":
    main()
