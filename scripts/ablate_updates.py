"""Sub-ablation of the _run_updates phase (estimator / component update /
weight update) plus the adaptation marginal, for any (codename, experiment).

Usage: python scripts/ablate_updates.py [CODENAME] [EXPERIMENT] [ITERS]

Same cumulative-prefix scan methodology as ablate_workload.py.
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmvi_tpu.configs import get_default_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.optimization.gmmvi import GMMVI
from gmmvi_tpu.optimization import sample_selectors as sel_ops
from gmmvi_tpu.optimization import ng_estimators as est_ops
from gmmvi_tpu.optimization import component_updaters as upd_ops
from gmmvi_tpu.optimization import weight_updaters as w_ops
from gmmvi_tpu.optimization import stepsize_adapters as step_ops

from ablate_workload import scan_timeit  # noqa: E402


def main():
    codename = sys.argv[1] if len(sys.argv) > 1 else "SAMTRON"
    experiment = sys.argv[2] if len(sys.argv) > 2 else "stm300"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    config = get_default_config(codename, experiment)
    target, model, meta = init_experiment(config)
    g = GMMVI.build_from_config(config, target, model, meta)
    g.train_iters(5)
    state = g.state

    def upto_finalize(state):
        state, prop = g._propose_phase(state)
        lnpdfs, grads = g._eval_target_bucketed(prop.samples, prop.valid)
        key, k_db, _ = jax.random.split(state.key, 3)
        db, window, pack = sel_ops.finalize_fused(
            state.model, state.db, g.selector_cfg, state.num_updates, prop,
            lnpdfs, grads, k_db)
        return state, window, pack

    def phase_finalize(state):
        state, window, pack = upto_finalize(state)
        return window.background_log_pdfs, window.valid

    def phase_est(state):
        state, window, pack = upto_finalize(state)
        est = est_ops.stein_estimate(
            state.model, window.samples, window.valid, window.mapping,
            window.background_log_pdfs, window.target_lnpdfs,
            window.target_grads,
            use_self_normalized_importance_weights=True,
            pack=pack, newest_mask=window.newest_mask)
        return est.expected_hessians_neg, est.expected_gradients_neg

    def phase_comp(state):
        state, window, pack = upto_finalize(state)
        model, meta2 = state.model, state.meta
        est = est_ops.stein_estimate(
            model, window.samples, window.valid, window.mapping,
            window.background_log_pdfs, window.target_lnpdfs,
            window.target_grads,
            use_self_normalized_importance_weights=True,
            pack=pack, newest_mask=window.newest_mask)
        new_stepsizes = step_ops.COMPONENT_STEPSIZE_ADAPTERS[
            g.component_stepsize_type](meta2, g.component_stepsize_cfg)
        meta2 = meta2.replace(
            stepsizes=jnp.where(model.mask, new_stepsizes, meta2.stepsizes))
        model, meta2 = upd_ops.UPDATERS[g.updater_type](
            model, meta2, est.expected_hessians_neg,
            est.expected_gradients_neg, meta2.stepsizes,
            temperature=g.temperature, search=g.trust_region_search,
            grid_size=g.trust_region_grid_size)
        return model.means, model.chols

    def phase_elr(state):
        state, window, pack = upto_finalize(state)
        model, meta2 = state.model, state.meta
        est = est_ops.stein_estimate(
            model, window.samples, window.valid, window.mapping,
            window.background_log_pdfs, window.target_lnpdfs,
            window.target_grads,
            use_self_normalized_importance_weights=True,
            pack=pack, newest_mask=window.newest_mask)
        new_stepsizes = step_ops.COMPONENT_STEPSIZE_ADAPTERS[
            g.component_stepsize_type](meta2, g.component_stepsize_cfg)
        meta2 = meta2.replace(
            stepsizes=jnp.where(model.mask, new_stepsizes, meta2.stepsizes))
        model, meta2 = upd_ops.UPDATERS[g.updater_type](
            model, meta2, est.expected_hessians_neg,
            est.expected_gradients_neg, meta2.stepsizes,
            temperature=g.temperature, search=g.trust_region_search,
            grid_size=g.trust_region_grid_size)
        elr, meta2 = w_ops.expected_log_ratios(
            model, meta2, window.samples, window.valid,
            window.background_log_pdfs, window.target_lnpdfs,
            g.temperature,
            g.weight_updater_cfg["use_self_normalized_importance_weights"])
        return elr

    def phase_updates(state):
        state, window, pack = upto_finalize(state)
        model, meta2, wstep = g._run_updates(state.model, state.meta,
                                             state.wstep, window, pack)
        return model.means, model.chols, model.log_weights

    def phase_full(state):
        return g._full_step(state)

    phases = [
        ("finalize prefix", phase_finalize),
        ("+ stein estimator", phase_est),
        ("+ component update (TR)", phase_comp),
        ("+ expected_log_ratios", phase_elr),
        ("+ weight update (full _run_updates)", phase_updates),
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
