"""Numerical parity against the actual reference implementation.

Runs the reference's TensorFlow code (read-only mount at /root/reference) on
CPU as an oracle for the modules that import without tensorflow-probability:
QuadFunc least squares, the KL trust-region component updater, the sample
database background densities, model densities, and the logistic-regression
target.  Skipped when the reference or tensorflow is unavailable.
"""
import os
import sys

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


def _rand_spd(rng, d, scale=1.0):
    a = rng.randn(d, d)
    return (scale * (a @ a.T) + 0.5 * np.eye(d)).astype(np.float32)


def test_quadfunc_parity():
    from gmmvi.optimization.least_squares import QuadFunc

    from gmmvi_tpu.ops.quadratic import fit_quadratic

    rng = np.random.RandomState(0)
    d, n = 4, 120
    x = rng.randn(n, d).astype(np.float32)
    y = rng.randn(n).astype(np.float32)
    w = rng.uniform(0.1, 1.0, n).astype(np.float32)
    mean = rng.randn(d).astype(np.float32)
    cov = _rand_spd(rng, d)
    chol = np.linalg.cholesky(cov).astype(np.float32)
    reg = 1e-8

    ref = QuadFunc(d)
    rq, rl, rc = ref.fit_quadratic(
        reg, n, tf.constant(x), tf.constant(y), tf.constant(w),
        tf.constant(mean), tf.constant(chol),
    )
    gq, gl, gc = fit_quadratic(
        jnp.asarray(reg), jnp.asarray(x), jnp.asarray(y), jnp.asarray(w),
        jnp.asarray(mean), jnp.asarray(np.linalg.inv(chol).astype(np.float32)),
    )
    np.testing.assert_allclose(np.asarray(gq), rq.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gl), rl.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(gc), float(rc), rtol=2e-3, atol=2e-3)


def test_model_density_parity():
    from gmmvi.models.full_cov_gmm import FullCovGMM

    from gmmvi_tpu.models import gmm as G

    rng = np.random.RandomState(1)
    k, d = 3, 5
    w = rng.dirichlet(np.ones(k)).astype(np.float32)
    mu = (rng.randn(k, d) * 2).astype(np.float32)
    covs = np.stack([_rand_spd(rng, d) for _ in range(k)])
    x = (rng.randn(31, d) * 2).astype(np.float32)

    ref = FullCovGMM(tf.constant(w), tf.constant(mu), tf.constant(covs))
    ref_comp = ref.component_log_densities(tf.constant(x)).numpy()
    ref_ld, ref_grad, _ = ref.log_density_and_grad(tf.constant(x))

    state = G.create_gmm_state(w, mu, covs, max_components=k + 2)
    got_comp = np.asarray(G.component_log_densities(state, jnp.asarray(x)))[:k]
    got_ld, got_grad, _ = G.log_density_and_grad(state, jnp.asarray(x))

    np.testing.assert_allclose(got_comp, ref_comp, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_ld), ref_ld.numpy(), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_grad), ref_grad.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_trust_region_updater_parity():
    """Full trust-region update (bracketing search incl. warm start) vs the
    reference implementation, via a minimal stand-in for GmmWrapper."""
    from gmmvi.optimization.gmmvi_modules.ng_based_component_updater import (
        KLConstrainedNgBasedComponentUpdater,
    )

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.models import meta as M
    from gmmvi_tpu.optimization.component_updaters import trust_region_update

    rng = np.random.RandomState(2)
    k, d = 3, 4
    w = np.ones(k, np.float32) / k
    mu = rng.randn(k, d).astype(np.float32)
    covs = np.stack([_rand_spd(rng, d) for _ in range(k)])
    hneg = np.stack([_rand_spd(rng, d, 0.3) for _ in range(k)])
    gneg = (rng.randn(k, d) * 2).astype(np.float32)
    stepsizes = np.asarray([0.05, 0.1, 0.02], np.float32)

    class WrapperStandIn:
        """Just the attributes the reference updater reads."""

        def __init__(self):
            self.diagonal_covs = False
            self.num_components = k
            self.num_dimensions = d
            self.means = tf.constant(mu)
            self.chol_cov = tf.constant(np.linalg.cholesky(covs).astype(np.float32))
            self.last_log_etas = tf.Variable(-np.ones(k, np.float32))
            self.l2_regularizers = tf.Variable(np.full(k, 1e-12, np.float32))
            self.initial_regularizer = 1e-12
            self.num_received_updates = tf.Variable(np.zeros(k, np.float32))
            self.new_means = None
            self.new_chols = None

        def replace_components(self, means, chols):
            self.new_means = means.numpy()
            self.new_chols = chols.numpy()

    wrapper = WrapperStandIn()
    ref_upd = KLConstrainedNgBasedComponentUpdater(wrapper, temperature=1.0)
    ref_upd.apply_NG_update(
        tf.constant(hneg), tf.constant(gneg), tf.constant(stepsizes)
    )

    kmax = k + 1
    model = G.create_gmm_state(w, mu, covs, max_components=kmax)
    meta = M.create_meta_state(model, 0.05, 1e-12, 4)
    meta = meta.replace(stepsizes=jnp.asarray(np.append(stepsizes, 0.05)))
    hneg_p = np.concatenate([hneg, np.eye(d, dtype=np.float32)[None] * 0.1])
    gneg_p = np.concatenate([gneg, np.zeros((1, d), np.float32)])
    res = trust_region_update(
        model, meta, jnp.asarray(hneg_p), jnp.asarray(gneg_p), meta.stepsizes
    )

    np.testing.assert_allclose(
        np.asarray(res.model.means[:k]), wrapper.new_means, rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(res.model.chols[:k]), wrapper.new_chols, rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(res.meta.last_etas[:k]),
        wrapper.last_log_etas.numpy(), rtol=5e-2,
    )


def test_sample_db_background_parity():
    from gmmvi.optimization.sample_db import SampleDB

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization import sample_db as DB

    rng = np.random.RandomState(3)
    k, d, n_per = 2, 3, 5
    w = np.ones(k, np.float32) / k
    mu = rng.randn(k, d).astype(np.float32)
    covs = np.stack([_rand_spd(rng, d) for _ in range(k)])
    model = G.create_gmm_state(w, mu, covs, max_components=k)

    ref_db = SampleDB(d, diagonal_covariances=False, keep_samples=True,
                      max_samples=10000)
    db = DB.create_sample_db(d, k, 64, 4, 16)

    for it in range(2):
        samples = rng.randn(k * n_per, d).astype(np.float32)
        mapping = np.repeat(np.arange(k), n_per).astype(np.int32)
        lnpdfs = rng.randn(k * n_per).astype(np.float32)
        grads = rng.randn(k * n_per, d).astype(np.float32)
        chols = np.linalg.cholesky(covs).astype(np.float32)
        ref_db.add_samples(
            tf.constant(samples), tf.constant(mu), tf.constant(chols),
            tf.constant(lnpdfs), tf.constant(grads), tf.constant(mapping),
        )
        db = DB.add_samples(
            db, jnp.asarray(it), model, jnp.asarray(samples),
            jnp.ones(k * n_per, bool), jnp.asarray(mapping),
            jnp.asarray(lnpdfs), jnp.asarray(grads), jax.random.PRNGKey(it),
        )

    n_query = k * n_per * 2
    ref_bg, ref_samples, ref_map, ref_lnpdfs, _ = ref_db.get_newest_samples(
        n_query
    )
    win = DB.get_newest_samples(db, 64, jnp.asarray(n_query), 16)
    v = np.asarray(win.valid)
    assert v.sum() == n_query
    got_samples = np.asarray(win.samples)[v]
    got_bg = np.asarray(win.background_log_pdfs)[v]
    # same chronological order (oldest first)
    np.testing.assert_allclose(got_samples, ref_samples.numpy(), rtol=1e-5)
    np.testing.assert_allclose(got_bg, ref_bg.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(win.target_lnpdfs)[v], ref_lnpdfs.numpy(), rtol=1e-6
    )


def test_logistic_regression_parity():
    from gmmvi.experiments.target_distributions.logistic_regression import (
        make_breast_cancer as ref_make,
    )

    from gmmvi_tpu.experiments.targets.logistic_regression import (
        make_breast_cancer,
    )

    ref = ref_make()
    ours = make_breast_cancer()
    assert ref.get_num_dimensions() == ours.get_num_dimensions()
    rng = np.random.RandomState(4)
    theta = (rng.randn(7, ours.get_num_dimensions()) * 0.1).astype(np.float32)
    ref_ld = ref.log_density(tf.constant(theta)).numpy()
    got_ld = np.asarray(ours.log_density(jnp.asarray(theta)))
    np.testing.assert_allclose(got_ld, ref_ld, rtol=1e-4, atol=1e-3)


def test_german_credit_parity():
    """German-credit posterior density matches the reference on the bundled
    UCI german.data-numeric file (reference: logistic_regression.py:36-68)."""
    from gmmvi.experiments.target_distributions.logistic_regression import (
        make_german_credit as ref_make,
    )

    from gmmvi_tpu.experiments.targets.logistic_regression import (
        make_german_credit,
    )

    ref = ref_make()
    ours = make_german_credit()
    assert ref.get_num_dimensions() == ours.get_num_dimensions() == 25
    rng = np.random.RandomState(5)
    theta = (rng.randn(6, ours.get_num_dimensions()) * 0.1).astype(np.float32)
    ref_ld = ref.log_density(tf.constant(theta)).numpy()
    got_ld = np.asarray(ours.log_density(jnp.asarray(theta)))
    np.testing.assert_allclose(got_ld, ref_ld, rtol=1e-4, atol=1e-3)


def test_decimating_db_overflow_parity():
    """Decimation-compatible DB mode vs the reference PAST max_samples:
    eviction keeps every 2nd sample ([::2]) and compacts the generating
    distributions (reference: sample_db.py:63-79, 111-112).  The surviving
    sample set, order, and newest-window background densities must match."""
    from gmmvi.optimization.sample_db import SampleDB

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization import sample_db as DB
    from gmmvi_tpu.optimization import sample_db_decimate as DEC

    rng = np.random.RandomState(11)
    k, d, n_per = 3, 2, 6
    max_samples = 40           # overflows after ~2 adds of 18
    w = np.ones(k, np.float32) / k

    ref_db = SampleDB(d, diagonal_covariances=False, keep_samples=True,
                      max_samples=max_samples)
    db = DEC.create_decimating_db(d, k, capacity=max_samples,
                                  dist_capacity=max_samples + k)

    for it in range(6):   # multiple decimation events
        mu = rng.randn(k, d).astype(np.float32) * (1 + it)
        covs = np.stack([_rand_spd(rng, d) for _ in range(k)])
        chols = np.linalg.cholesky(covs).astype(np.float32)
        model = G.create_gmm_state(w, mu, covs, max_components=k)
        samples = rng.randn(k * n_per, d).astype(np.float32)
        mapping = np.repeat(np.arange(k), n_per).astype(np.int32)
        lnpdfs = rng.randn(k * n_per).astype(np.float32)
        grads = rng.randn(k * n_per, d).astype(np.float32)
        ref_db.add_samples(
            tf.constant(samples), tf.constant(mu), tf.constant(chols),
            tf.constant(lnpdfs), tf.constant(grads), tf.constant(mapping),
        )
        # dispatch through the generic entry point (what the step calls)
        db = DB.add_samples(
            db, jnp.asarray(it), model, jnp.asarray(samples),
            jnp.ones(k * n_per, bool), jnp.asarray(mapping),
            jnp.asarray(lnpdfs), jnp.asarray(grads), jax.random.PRNGKey(it),
        )

    ref_n = int(tf.shape(ref_db.samples)[0])
    assert int(db.count) == ref_n
    np.testing.assert_allclose(
        np.asarray(db.samples[: int(db.count)]), ref_db.samples.numpy(),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(db.target_lnpdfs[: int(db.count)]),
        ref_db.target_lnpdfs.numpy(), rtol=1e-6)
    # distribution table compacted identically
    assert int(db.dist_count) == int(tf.shape(ref_db.means)[0])
    np.testing.assert_allclose(
        np.asarray(db.dist_means[: int(db.dist_count)]),
        ref_db.means.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(db.dist_idx[: int(db.count)]), ref_db.mapping.numpy())

    # newest-window background densities across the decimated history
    n_query = 20
    ref_bg, ref_samples, _, _, _ = ref_db.get_newest_samples(n_query)
    win = DB.get_newest_samples(db, 32, jnp.asarray(n_query), 64)
    v = np.asarray(win.valid)
    assert v.sum() == min(n_query, ref_n)
    np.testing.assert_allclose(
        np.asarray(win.samples)[v], ref_samples.numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(win.background_log_pdfs)[v], ref_bg.numpy(),
        rtol=1e-3, atol=1e-3)
