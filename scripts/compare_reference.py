"""Head-to-head: full reference optimizer vs gmmvi_tpu on an identical target.

Runs the ACTUAL reference implementation (mounted read-only at
/root/reference, executed on CPU TensorFlow with a 2-function
tensorflow-probability stand-in) and this framework on the same
Student-T-mixture target with the same SAMTRON hyperparameters, then compares
final ELBO (the BASELINE acceptance criterion: parity within Monte-Carlo
error) and per-iteration walltime.

The TF target is written here from the Student-T density formula — it is an
input to the reference, not part of it.

Usage: python scripts/compare_reference.py [--iters 200] [--dims 10]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/src"


def install_tfp_shim(tf):
    if "tensorflow_probability" in sys.modules:
        return
    shim = types.ModuleType("tensorflow_probability")
    math_mod = types.ModuleType("tensorflow_probability.math")

    def reduce_weighted_logsumexp(logx, w=None, axis=None, keepdims=False,
                                  return_sign=False):
        logx = tf.convert_to_tensor(logx)
        if w is None:
            w = tf.ones_like(logx)
        m = tf.reduce_max(logx, axis=axis, keepdims=True)
        m_safe = tf.where(tf.math.is_finite(m), m, tf.zeros_like(m))
        total = tf.reduce_sum(w * tf.exp(logx - m_safe), axis=axis,
                              keepdims=keepdims)
        sign = tf.sign(total)
        m_out = m_safe if keepdims else tf.squeeze(m_safe, axis=axis)
        lswe = tf.math.log(tf.abs(total)) + m_out
        return (lswe, sign) if return_sign else lswe

    math_mod.reduce_weighted_logsumexp = reduce_weighted_logsumexp
    dist_mod = types.ModuleType("tensorflow_probability.distributions")

    class Normal:
        def __init__(self, loc, scale):
            self.loc, self.scale = loc, scale

        def prob(self, x):
            z = (x - self.loc) / self.scale
            return tf.exp(-0.5 * z * z) / (
                self.scale * math.sqrt(2.0 * math.pi))

    dist_mod.Normal = Normal
    shim.math, shim.distributions = math_mod, dist_mod
    sys.modules["tensorflow_probability"] = shim
    sys.modules["tensorflow_probability.math"] = math_mod
    sys.modules["tensorflow_probability.distributions"] = dist_mod


def make_stm_params(d, seed=0):
    from gmmvi_tpu.experiments.targets.student_t_mixture import make_target

    stm = make_target(num_dimensions=d, harder_setting=False, seed=seed)
    return stm  # holds weights/means/covs + JAX log_density


def algorithm_config(n_des, kmax, codename="SAMTRON", diagonal=False,
                     extra_overrides=None):
    """Shared config dict for both sides: the package's default module
    configs for ``codename`` (same YAMLs the reference ships), with the
    small-run experiment overrides of the original SAMTRON harness."""
    from gmmvi_tpu.configs import get_default_algorithm_config, update_config

    cfg = get_default_algorithm_config(codename)
    overrides = {
        "temperature": 1.0,
        "sample_selector_config": {
            "desired_samples_per_component": n_des,
            "ratio_reused_samples_to_desired": 0.0,
        },
        "use_sample_database": True,
        "max_database_size": 10_000_000,
        "model_initialization": {
            "use_diagonal_covs": diagonal, "num_initial_components": 8,
            "prior_mean": 0.0, "prior_scale": 20.0, "initial_cov": 100.0,
        },
        "component_stepsize_adapter_config": {"initial_stepsize": 0.1},
    }
    if cfg["num_component_adapter_type"] == "adaptive":
        overrides["num_component_adapter_config"] = {
            "del_iters": 100, "add_iters": 30, "max_components": kmax,
            "thresholds_for_add_heuristic": [5000.0, 1000.0, 500.0, 200.0,
                                             100.0, 50.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 1024, "num_prior_samples": 0,
        }
    cfg = update_config(cfg, overrides)
    if extra_overrides:
        cfg = update_config(cfg, extra_overrides)
    return cfg


def run_reference(stm, iters, n_des, kmax, seed=0, k0=8, codename="SAMTRON",
                  diagonal=False, extra_overrides=None):
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    install_tfp_shim(tf)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from gmmvi.experiments.target_distributions.lnpdf import LNPDF
    from gmmvi.models.diagonal_gmm import DiagonalGMM
    from gmmvi.models.full_cov_gmm import FullCovGMM
    from gmmvi.models.gmm_wrapper import GmmWrapper
    from gmmvi.optimization.gmmvi import GMMVI

    nu = 2.0
    d = stm.get_num_dimensions()
    chols = np.linalg.cholesky(stm.target_covs.astype(np.float64))
    inv_chols = tf.constant(np.linalg.inv(chols), tf.float32)
    log_dets = tf.constant(
        np.sum(np.log(np.diagonal(chols, axis1=-2, axis2=-1)), axis=-1),
        tf.float32)
    means = tf.constant(stm.target_means, tf.float32)
    log_w = tf.constant(
        np.log(stm.target_weights / stm.target_weights.sum()), tf.float32)
    const = (
        math.lgamma(0.5 * (nu + d)) - math.lgamma(0.5 * nu)
        - 0.5 * d * math.log(nu * math.pi)
    )

    class TFStudentT(LNPDF):
        """Student-T mixture target in plain TF (input to the reference)."""

        def __init__(self):
            super().__init__(use_log_density_and_grad=False,
                             safe_for_tf_graph=True)

        def get_num_dimensions(self):
            return d

        def log_density(self, x):
            diffs = tf.expand_dims(tf.cast(x, tf.float32), 0) \
                - tf.expand_dims(means, 1)
            y = tf.einsum("kij,knj->kni", inv_chols, diffs)
            maha = tf.reduce_sum(tf.square(y), axis=-1)
            comp = (
                const - tf.expand_dims(log_dets, 1)
                - 0.5 * (nu + d) * tf.math.log1p(maha / nu)
            )
            return tf.reduce_logsumexp(comp + tf.expand_dims(log_w, 1), axis=0)

    tf.random.set_seed(seed)
    np.random.seed(seed)
    target = TFStudentT()

    rng = np.random.RandomState(seed)
    w0 = np.ones(k0, np.float32) / k0
    mu0 = (rng.standard_normal((k0, d)) * 20.0).astype(np.float32)
    if diagonal:
        chols0 = np.full((k0, d), 10.0, np.float32)  # sqrt(100)
        model = DiagonalGMM(tf.constant(w0), tf.constant(mu0),
                            tf.constant(chols0))
    else:
        covs0 = np.tile((100.0 * np.eye(d, dtype=np.float32))[None],
                        (k0, 1, 1))
        model = FullCovGMM(tf.constant(w0), tf.constant(mu0),
                           tf.constant(covs0))
    cfg = algorithm_config(n_des, kmax, codename=codename, diagonal=diagonal,
                           extra_overrides=extra_overrides)
    wrapped = GmmWrapper.build_from_config(model=model, config=cfg)
    gmmvi = GMMVI.build_from_config(config=cfg, target_distribution=target,
                                    model=wrapped)
    t_compile0 = time.perf_counter()
    gmmvi.train_iter()
    compile_s = time.perf_counter() - t_compile0
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        gmmvi.train_iter()
    per_iter = (time.perf_counter() - t0) / max(iters - 1, 1)

    samples = gmmvi.model.sample(2000)[0]
    elbo = float(
        tf.reduce_mean(target.log_density(samples))
        - tf.reduce_mean(gmmvi.model.log_density(samples))
    )
    return {
        "elbo": elbo,
        "per_iter_s": per_iter,
        "first_iter_s": compile_s,
        "num_components": int(gmmvi.model.num_components),
        "fevals": int(gmmvi.sample_db.num_samples_written.numpy()),
        "mu0": mu0,
    }


def run_ours(stm, iters, n_des, kmax, mu0, seed=0, codename="SAMTRON",
             diagonal=False, extra_overrides=None):
    import jax
    import jax.numpy as jnp

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.models import meta as M
    from gmmvi_tpu.models.gmm import create_gmm_state
    from gmmvi_tpu.optimization.gmmvi import GMMVI

    d = stm.get_num_dimensions()
    k0 = mu0.shape[0]
    if diagonal:
        covs0 = np.full((k0, d), 100.0, np.float32)
    else:
        covs0 = np.tile((100.0 * np.eye(d, dtype=np.float32))[None],
                        (k0, 1, 1))
    model = create_gmm_state(np.ones(k0, np.float32) / k0, mu0, covs0,
                             max_components=kmax, diagonal=diagonal)
    cfg = dict(algorithm_config(n_des, kmax, codename=codename,
                                diagonal=diagonal,
                                extra_overrides=extra_overrides))
    cfg["seed"] = seed
    cfg["tpu"] = {"max_components": kmax}
    meta = M.create_meta_state(
        model, initial_stepsize=0.1, initial_regularizer=1e-12,
        max_reward_history_length=M.history_length_from_config(cfg),
    )
    gmmvi = GMMVI.build_from_config(cfg, stm, model, meta, seed=seed)
    t0 = time.perf_counter()
    gmmvi.train_iter()
    jax.block_until_ready(gmmvi.state.model.means)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        gmmvi.train_iter()
    jax.block_until_ready(gmmvi.state.model.means)
    per_iter = (time.perf_counter() - t0) / max(iters - 1, 1)

    samples, _ = G.sample(gmmvi.state.model, jax.random.PRNGKey(seed + 99),
                          2000)
    elbo = float(
        jnp.mean(stm.log_density(samples))
        - jnp.mean(G.log_density(gmmvi.state.model, samples))
    )
    return {
        "elbo": elbo,
        "per_iter_s": per_iter,
        "first_iter_s": compile_s,
        "num_components": int(gmmvi.state.model.num_active),
        "fevals": int(gmmvi.state.db.num_samples_written),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--dims", type=int, default=10)
    ap.add_argument("--n-des", type=int, default=64)
    ap.add_argument("--kmax", type=int, default=16)
    ap.add_argument("--codename", type=str, default="SAMTRON")
    ap.add_argument("--diagonal", action="store_true")
    args = ap.parse_args()

    stm = make_stm_params(args.dims, seed=0)
    ref = run_reference(stm, args.iters, args.n_des, args.kmax,
                        codename=args.codename, diagonal=args.diagonal)
    mu0 = ref.pop("mu0")
    ours = run_ours(stm, args.iters, args.n_des, args.kmax, mu0,
                    codename=args.codename, diagonal=args.diagonal)

    print(json.dumps({"reference_tf_cpu": ref, "gmmvi_tpu": ours,
                      "elbo_gap": ours["elbo"] - ref["elbo"],
                      "speedup_per_iter": ref["per_iter_s"] / ours["per_iter_s"]},
                     indent=2, default=float))


if __name__ == "__main__":
    main()
