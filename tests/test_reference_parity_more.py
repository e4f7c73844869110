"""More reference-oracle parity tests, with a minimal tfp stand-in.

The reference modules under test import tensorflow_probability only for
``tfp.math.reduce_weighted_logsumexp`` (weight updater) and
``tfp.distributions.Normal`` (component-adaptation smoothing kernel).  A tiny
test shim provides those two symbols so the reference code itself runs as the
oracle on CPU TensorFlow.
"""
import math
import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference/src"
tf = pytest.importorskip("tensorflow")
if not os.path.isdir(REF):
    pytest.skip("reference not mounted", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)
tf.config.set_visible_devices([], "GPU")


def _install_tfp_shim():
    if "tensorflow_probability" in sys.modules:
        return
    shim = types.ModuleType("tensorflow_probability")

    math_mod = types.ModuleType("tensorflow_probability.math")

    def reduce_weighted_logsumexp(logx, w=None, axis=None, keepdims=False,
                                  return_sign=False):
        # log |sum_i w_i exp(logx_i)| with sign, like tfp's implementation
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
        if return_sign:
            return lswe, sign
        return lswe

    math_mod.reduce_weighted_logsumexp = reduce_weighted_logsumexp

    dist_mod = types.ModuleType("tensorflow_probability.distributions")

    class Normal:
        def __init__(self, loc, scale):
            self.loc = tf.convert_to_tensor(loc, tf.float32)
            self.scale = tf.convert_to_tensor(scale, tf.float32)

        def prob(self, x):
            x = tf.convert_to_tensor(x, tf.float32)
            z = (x - self.loc) / self.scale
            return tf.exp(-0.5 * z * z) / (
                self.scale * math.sqrt(2.0 * math.pi)
            )

    dist_mod.Normal = Normal
    shim.math = math_mod
    shim.distributions = dist_mod
    sys.modules["tensorflow_probability"] = shim
    sys.modules["tensorflow_probability.math"] = math_mod
    sys.modules["tensorflow_probability.distributions"] = dist_mod


_install_tfp_shim()


class ModelStandIn:
    """The GmmWrapper attributes the reference weight updater reads."""

    def __init__(self, log_weights, means, covs, reward_history):
        self.diagonal_covs = False
        k, d = means.shape
        self.num_components = k
        self.num_dimensions = d
        self.log_weights = tf.constant(log_weights)
        self.means = tf.constant(means)
        self.chol_cov = tf.constant(np.linalg.cholesky(covs).astype(np.float32))
        self.reward_history = tf.Variable(reward_history)
        self.stored_rewards = None
        self.new_log_weights = None

    @property
    def weights(self):
        return tf.exp(self.log_weights)

    def log_densities_also_individual(self, samples):
        diffs = tf.expand_dims(samples, 0) - tf.expand_dims(self.means, 1)
        sqrts = tf.linalg.triangular_solve(
            self.chol_cov, tf.transpose(diffs, [0, 2, 1])
        )
        mahalas = -0.5 * tf.reduce_sum(sqrts * sqrts, axis=1)
        consts = (
            -0.5 * tf.reduce_sum(
                tf.math.log(tf.square(tf.linalg.diag_part(self.chol_cov))),
                axis=1)
            - 0.5 * self.num_dimensions * tf.math.log(2 * tf.constant(math.pi))
        )
        comp = mahalas + tf.expand_dims(consts, 1)
        weighted = comp + tf.expand_dims(self.log_weights, axis=1)
        return tf.reduce_logsumexp(weighted, axis=0), comp

    def store_rewards(self, rewards):
        self.stored_rewards = rewards.numpy()

    def replace_weights(self, new_log_weights):
        lw = new_log_weights - tf.reduce_logsumexp(new_log_weights)
        self.new_log_weights = lw.numpy()


def _mk_problem(seed=0, k=4, d=3, n=400):
    rng = np.random.RandomState(seed)
    lw = np.log(rng.dirichlet(np.ones(k))).astype(np.float32)
    means = (rng.randn(k, d) * 2).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32) * 0.4
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    samples = (rng.randn(n, d) * 2).astype(np.float32)
    bg = (rng.randn(n) * 0.3 - 5.0).astype(np.float32)
    target = (rng.randn(n) * 2 - 3.0).astype(np.float32)
    return lw, means, covs, samples, bg, target


@pytest.mark.parametrize("sniw", [True, False])
@pytest.mark.parametrize("updater_type", ["trust-region", "direct"])
def test_weight_updater_parity(sniw, updater_type):
    from gmmvi.optimization.gmmvi_modules.weight_updater import (
        DirectWeightUpdater,
        TrustRegionBasedWeightUpdater,
    )

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.models import meta as M
    from gmmvi_tpu.optimization import weight_updaters as W

    lw, means, covs, samples, bg, target = _mk_problem()
    k, d = means.shape
    hist = np.full((k, 4), np.finfo(np.float32).min, np.float32)

    ref_model = ModelStandIn(lw, means, covs, hist)
    cls = (TrustRegionBasedWeightUpdater if updater_type == "trust-region"
           else DirectWeightUpdater)
    ref_upd = cls(ref_model, temperature=1.0,
                  use_self_normalized_importance_weights=sniw)
    stepsize = 0.01 if updater_type == "trust-region" else 0.4
    ref_upd.update_weights(tf.constant(samples), tf.constant(bg),
                           tf.constant(target), tf.constant(stepsize))

    model = G.create_gmm_state(np.exp(lw), means, covs, max_components=k + 2)
    meta = M.create_meta_state(model, 1.0, 1e-12, 4)
    elr, meta = W.expected_log_ratios(
        model, meta, jnp.asarray(samples),
        jnp.ones(len(samples), bool), jnp.asarray(bg), jnp.asarray(target),
        temperature=1.0, use_self_normalized_importance_weights=sniw,
    )
    # stored component rewards match
    np.testing.assert_allclose(
        np.asarray(meta.reward_history[:k, -1]), ref_model.stored_rewards,
        rtol=2e-3, atol=2e-3,
    )
    if updater_type == "trust-region":
        new_model, _ = W.trust_region_weight_update(model, meta, elr,
                                                    stepsize, 1.0)
    else:
        new_model, _ = W.direct_weight_update(model, meta, elr, stepsize, 1.0)
    np.testing.assert_allclose(
        np.asarray(new_model.log_weights[:k]), ref_model.new_log_weights,
        rtol=5e-3, atol=5e-3,
    )


def test_component_stepsize_parity():
    from gmmvi.optimization.gmmvi_modules.component_stepsize_adaptation import (
        DecayingComponentStepsizeAdaptation,
        ImprovementBasedComponentStepsizeAdaptation,
    )

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.models import meta as M
    from gmmvi_tpu.optimization import stepsize_adapters as S

    rng = np.random.RandomState(1)
    k = 5
    hist = rng.randn(k, 4).astype(np.float32)
    nupd = rng.randint(0, 9, k).astype(np.float32)
    stepsizes = rng.uniform(0.01, 0.5, k).astype(np.float32)

    class WrapperStandIn:
        reward_history = tf.constant(hist)
        num_received_updates = tf.constant(nupd)
        stepsizes = tf.constant(np.full(k, 0.3, np.float32))

    cfg = dict(initial_stepsize=0.3, min_stepsize=0.001, max_stepsize=1.0,
               stepsize_inc_factor=1.15, stepsize_dec_factor=0.85)
    ref = ImprovementBasedComponentStepsizeAdaptation(WrapperStandIn(), **cfg)
    ref_new = ref.update_stepsize(tf.constant(stepsizes)).numpy()

    model = G.create_gmm_state(
        np.ones(k, np.float32) / k, np.zeros((k, 2), np.float32),
        np.tile(np.eye(2, dtype=np.float32)[None], (k, 1, 1)),
        max_components=k,
    )
    meta = M.create_meta_state(model, 0.3, 1e-12, 4)
    meta = meta.replace(reward_history=jnp.asarray(hist),
                        num_received_updates=jnp.asarray(nupd),
                        stepsizes=jnp.asarray(stepsizes))
    got = np.asarray(S.improvement_based_component_stepsize(meta, cfg))
    np.testing.assert_allclose(got, ref_new, rtol=1e-5)

    ref_dec = DecayingComponentStepsizeAdaptation(
        WrapperStandIn(), annealing_exponent=0.55, initial_stepsize=0.3
    ).update_stepsize(tf.constant(stepsizes)).numpy()
    got_dec = np.asarray(S.decaying_component_stepsize(
        meta, dict(initial_stepsize=0.3, annealing_exponent=0.55)))
    np.testing.assert_allclose(got_dec, ref_dec, rtol=1e-5)


def test_delete_heuristic_parity():
    """Smoothed-reward delete criteria vs the reference implementation."""
    from gmmvi.optimization.gmmvi_modules.component_adaptation import (
        VipsComponentAdaptation,
    )

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.models import meta as M
    from gmmvi_tpu.optimization import component_adaptation as A

    rng = np.random.RandomState(2)
    k, d = 5, 2
    del_iters = 9
    h = 2 * max(2, del_iters)
    f32min = np.finfo(np.float32).min

    rh = rng.uniform(-30, -1, (k, h)).astype(np.float32)
    rh[1] = -50.0                     # stagnant
    rh[3, : h - 3] = f32min           # too young
    wh = rng.uniform(0.1, 0.4, (k, h)).astype(np.float32)
    wh[1] = 1e-8                      # low weight
    wh[3] = 1e-8

    removed = []

    class WrapperStandIn:
        reward_history = tf.constant(rh)
        weight_history = tf.constant(wh)

        def remove_component(self, idx):
            removed.append(int(idx))

    ref = VipsComponentAdaptation.__new__(VipsComponentAdaptation)
    ref.model = WrapperStandIn()
    ref.del_iters = del_iters
    ref.min_weight_for_del_heuristic = 1e-4
    import tensorflow_probability as tfp_shim
    ref.filter_delay = tf.cast(tf.floor(del_iters / 3), tf.int32)
    gaussian = tfp_shim.distributions.Normal(
        tf.constant(0, tf.float32), tf.constant(del_iters / 8.0, tf.float32)
    )
    kern = gaussian.prob(tf.range(-int(ref.filter_delay),
                                  int(ref.filter_delay), dtype=tf.float32))
    ref.kernel = tf.reshape(kern / tf.reduce_sum(kern), [-1, 1, 1])
    ref.reward_improvements = tf.Variable(tf.zeros(0), shape=[None])
    ref.delete_bad_components()

    model = G.create_gmm_state(
        np.ones(k, np.float32) / k, rng.randn(k, d).astype(np.float32),
        np.tile(np.eye(d, dtype=np.float32)[None], (k, 1, 1)),
        max_components=k + 1,
    )
    meta = M.create_meta_state(model, 1.0, 1e-12, h)
    pad = np.full((1, h), f32min, np.float32)  # padded slot row
    meta = meta.replace(
        reward_history=jnp.asarray(np.concatenate([rh, pad])),
        weight_history=jnp.asarray(np.concatenate([wh, pad])),
    )
    cfg = A.VipsConfig(
        del_iters=del_iters, add_iters=3, max_components=8,
        thresholds_for_add_heuristic=(100.0,),
        min_weight_for_del_heuristic=1e-4,
        num_database_samples=8, num_prior_samples=0, prior_entropy=None,
    )
    new_model, _ = A.delete_bad_components(model, meta, cfg)
    got_removed = k - int(new_model.num_active)
    assert got_removed == len(removed)
    # component 1 (stagnant + low weight + old) must be the removal in both
    assert removed == [1]
    # survivors keep their means in order
    keep = [i for i in range(k) if i not in removed]
    np.testing.assert_allclose(
        np.asarray(new_model.means[: len(keep)]),
        np.asarray(model.means)[keep], rtol=1e-6,
    )


class _SteinModelStandIn:
    """The GmmWrapper attributes the reference SteinNgEstimator reads."""

    def __init__(self, log_weights, means, covs):
        self.diagonal_covs = False
        k, d = means.shape
        self.num_components = k
        self.num_dimensions = d
        self.log_weights = tf.constant(log_weights)
        self.means = tf.constant(means)
        self.chol_cov = tf.constant(np.linalg.cholesky(covs).astype(np.float32))
        self.l2_regularizers = tf.constant(np.full(k, 1e-12, np.float32))

    def component_log_densities(self, samples):
        diffs = tf.expand_dims(samples, 0) - tf.expand_dims(self.means, 1)
        sqrts = tf.linalg.triangular_solve(
            self.chol_cov, tf.transpose(diffs, [0, 2, 1]))
        mahalas = -0.5 * tf.reduce_sum(sqrts * sqrts, axis=1)
        consts = (
            -0.5 * tf.reduce_sum(
                tf.math.log(tf.square(tf.linalg.diag_part(self.chol_cov))),
                axis=1)
            - 0.5 * self.num_dimensions * tf.math.log(
                2 * tf.constant(math.pi))
        )
        return mahalas + tf.expand_dims(consts, 1)

    def log_density_and_grad(self, samples):
        with tf.GradientTape() as tape:
            tape.watch(samples)
            comp = self.component_log_densities(samples)
            dens = tf.reduce_logsumexp(
                comp + tf.expand_dims(self.log_weights, 1), axis=0)
        grad = tape.gradient(dens, samples)
        return dens, grad, comp


@pytest.mark.parametrize("sniw", [True, False])
def test_stein_own_samples_historical_parity(sniw):
    """only_use_own_samples with HISTORICAL samples in the window: the
    reference's relative mapping (ng_estimator.py:244) lets only the newest
    add batch match the current components — older batches match nothing.
    Verified against the reference estimator with a two-batch window."""
    from gmmvi.optimization.gmmvi_modules.ng_estimator import SteinNgEstimator

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization.ng_estimators import stein_estimate

    rng = np.random.RandomState(7)
    k, d, n0, n1 = 3, 2, 30, 24
    lw = np.log(rng.dirichlet(np.ones(k))).astype(np.float32)
    means = (rng.randn(k, d) * 2).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)

    samples = (rng.randn(n0 + n1, d) * 2).astype(np.float32)
    slots = np.concatenate([
        rng.randint(0, k, n0), rng.randint(0, k, n1)
    ]).astype(np.int32)
    # reference DB mapping: global distribution indices; the older add
    # appended dists 0..k-1, the newest add k..2k-1
    global_mapping = slots + np.concatenate(
        [np.zeros(n0, np.int32), np.full(n1, k, np.int32)])
    bg = (rng.randn(n0 + n1) * 0.3 - 4.0).astype(np.float32)
    target = (rng.randn(n0 + n1) - 2.0).astype(np.float32)
    tgrads = (rng.randn(n0 + n1, d) * 0.5).astype(np.float32)

    ref_model = _SteinModelStandIn(lw, means, covs)
    ref_est = SteinNgEstimator(
        temperature=1.0, model=ref_model, only_use_own_samples=True,
        use_self_normalized_importance_weights=sniw)
    ref_h, ref_g = ref_est.get_expected_hessian_and_grad(
        tf.constant(samples), tf.constant(global_mapping), tf.constant(bg),
        tf.constant(target), tf.constant(tgrads))

    state = G.create_gmm_state(np.exp(lw), means, covs, max_components=k)
    n = n0 + n1
    est = stein_estimate(
        state, jnp.asarray(samples), jnp.ones(n, bool), jnp.asarray(slots),
        jnp.asarray(bg), jnp.asarray(target), jnp.asarray(tgrads),
        use_self_normalized_importance_weights=sniw,
        only_use_own_samples=True,
        newest_mask=jnp.asarray(
            np.concatenate([np.zeros(n0, bool), np.ones(n1, bool)])),
    )
    np.testing.assert_allclose(
        np.asarray(est.expected_gradients_neg), ref_g.numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(est.expected_hessians_neg), ref_h.numpy(),
        rtol=1e-4, atol=1e-5)
