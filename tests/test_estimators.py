"""Natural-gradient estimator tests against closed forms.

For a Gaussian target p = N(m, S) and component q = N(mu, Sigma):
  grad log(p/q)(x)  = -S^{-1}(x - m) + Sigma^{-1}(x - mu)
  E_q[grad log p/q] = -S^{-1}(mu - m)
  E_q[hess log p/q] = -S^{-1} + Sigma^{-1}
so expected_hessian_neg -> S^{-1} - Sigma^{-1} and
expected_gradient_neg -> S^{-1}(mu - m).
"""
import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.optimization.ng_estimators import more_estimate, stein_estimate


def _single_gaussian_state(mu, cov, kmax=3):
    return G.create_gmm_state(
        np.ones(1, np.float32), mu[None], cov[None], max_components=kmax
    )


def _target_quantities(m, s_cov):
    s_inv = np.linalg.inv(s_cov)

    def lnpdf(x):
        diff = x - m
        return -0.5 * np.einsum("ni,ij,nj->n", diff, s_inv, diff)

    def grads(x):
        return -(x - m) @ s_inv.T

    return lnpdf, grads


def test_stein_estimator_gaussian_closed_form():
    rng = np.random.RandomState(0)
    d = 3
    mu = rng.randn(d).astype(np.float32)
    a = rng.randn(d, d)
    cov = (a @ a.T + 2 * np.eye(d)).astype(np.float32)
    m = (mu + 0.5).astype(np.float32)
    s_cov = np.eye(d, dtype=np.float32) * 2.0
    lnpdf, tgrads = _target_quantities(m, s_cov)

    state = _single_gaussian_state(mu, cov)
    n = 40_000
    key = jax.random.PRNGKey(0)
    samples = np.asarray(G.sample(state, key, n)[0])
    mask = jnp.ones(n, bool)
    mapping = jnp.zeros(n, jnp.int32)
    bg = G.log_density(state, jnp.asarray(samples))  # sampled from the model

    est = stein_estimate(
        state, jnp.asarray(samples), mask, mapping, bg,
        jnp.asarray(lnpdf(samples), jnp.float32),
        jnp.asarray(tgrads(samples), jnp.float32),
        use_self_normalized_importance_weights=True,
    )
    s_inv = np.linalg.inv(s_cov)
    want_hneg = s_inv - np.linalg.inv(cov)
    want_gneg = s_inv @ (mu - m)
    np.testing.assert_allclose(
        np.asarray(est.expected_gradients_neg[0]), want_gneg, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(est.expected_hessians_neg[0]), want_hneg, atol=0.08
    )


def test_stein_estimator_standard_iw_matches_sn_on_exact_weights():
    """With bg == sampling density, standard IW and SN IW should agree in
    expectation."""
    rng = np.random.RandomState(1)
    d = 2
    mu = np.zeros(d, np.float32)
    cov = np.eye(d, dtype=np.float32)
    m = np.ones(d, np.float32) * 0.3
    s_cov = np.eye(d, dtype=np.float32)
    lnpdf, tgrads = _target_quantities(m, s_cov)

    state = _single_gaussian_state(mu, cov)
    n = 60_000
    samples = np.asarray(G.sample(state, jax.random.PRNGKey(2), n)[0])
    mask = jnp.ones(n, bool)
    mapping = jnp.zeros(n, jnp.int32)
    bg = G.log_density(state, jnp.asarray(samples))

    kwargs = dict(
        model=state, samples=jnp.asarray(samples), sample_mask=mask,
        mapping=mapping, background=bg,
        target_lnpdfs=jnp.asarray(lnpdf(samples), jnp.float32),
        target_grads=jnp.asarray(tgrads(samples), jnp.float32),
    )
    e1 = stein_estimate(**kwargs, use_self_normalized_importance_weights=True)
    e2 = stein_estimate(**kwargs, use_self_normalized_importance_weights=False)
    np.testing.assert_allclose(
        np.asarray(e1.expected_gradients_neg[0]),
        np.asarray(e2.expected_gradients_neg[0]), atol=0.03,
    )
    np.testing.assert_allclose(
        np.asarray(e1.expected_hessians_neg[0]),
        np.asarray(e2.expected_hessians_neg[0]), atol=0.06,
    )


def test_stein_masked_samples_are_ignored():
    rng = np.random.RandomState(3)
    d, n = 2, 500
    mu = np.zeros(d, np.float32)
    state = _single_gaussian_state(mu, np.eye(d, dtype=np.float32))
    samples = rng.randn(n, d).astype(np.float32)
    lnpdfs = rng.randn(n).astype(np.float32)
    grads = rng.randn(n, d).astype(np.float32)
    bg = G.log_density(state, jnp.asarray(samples))
    mapping = jnp.zeros(n, jnp.int32)

    full_mask = np.zeros(n, bool)
    full_mask[:300] = True
    est_masked = stein_estimate(
        state, jnp.asarray(samples), jnp.asarray(full_mask), mapping, bg,
        jnp.asarray(lnpdfs), jnp.asarray(grads),
    )
    est_subset = stein_estimate(
        state, jnp.asarray(samples[:300]), jnp.ones(300, bool),
        mapping[:300], bg[:300], jnp.asarray(lnpdfs[:300]),
        jnp.asarray(grads[:300]),
    )
    np.testing.assert_allclose(
        np.asarray(est_masked.expected_gradients_neg[0]),
        np.asarray(est_subset.expected_gradients_neg[0]), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(est_masked.expected_hessians_neg[0]),
        np.asarray(est_subset.expected_hessians_neg[0]), rtol=1e-4, atol=1e-5,
    )


def test_stein_standard_iw_extreme_log_ratios_stay_finite():
    """Standard-IW moments at log_iw ~ 150 (early training: peaked component
    vs broad background).  Raw ``exp(log_iw)`` overflows float32 at ~88; the
    reference survives through the signed reduce_weighted_logsumexp trick
    (ng_estimator.py:146-152).  The estimator must match a float64 oracle of
    exactly that expectation."""
    rng = np.random.RandomState(7)
    d, n = 3, 64
    # two symmetric components: at x ~ 0 the mixture gradient cancels
    # EXACTLY, so the log-ratio grads can be made tiny (representable) while
    # the whitened diffs ptd stay O(1)
    mus = np.stack([np.full(d, 0.7), np.full(d, -0.7)]).astype(np.float32)
    covs = np.tile(np.eye(d, dtype=np.float32)[None], (2, 1, 1))
    state = G.create_gmm_state(
        np.array([0.5, 0.5], np.float32), mus, covs, max_components=2)

    # log-ratio grads ~ 1e-24: exp(log_iw) * g is f32-representable even
    # though exp(log_iw) alone is not — exactly the intermediate-overflow
    # regime the reference's signed-LSE trick survives
    samples = (rng.randn(n, d) * 1e-25).astype(np.float32)
    tgrads = (rng.randn(n, d) * 1e-24).astype(np.float32)
    lnpdfs = rng.randn(n).astype(np.float32)

    comp_ld = np.asarray(G.component_log_densities(state, jnp.asarray(samples)))
    log_iw = 140.0  # >> 88, the f32 exp-overflow threshold
    bg = jnp.asarray(comp_ld[0] - log_iw, jnp.float32)

    est = stein_estimate(
        state, jnp.asarray(samples), jnp.ones(n, bool),
        jnp.zeros(n, jnp.int32), bg, jnp.asarray(lnpdfs),
        jnp.asarray(tgrads),
        use_self_normalized_importance_weights=False,
    )
    got_g = np.asarray(est.expected_gradients_neg[0])
    got_h = np.asarray(est.expected_hessians_neg[0])
    assert np.all(np.isfinite(got_g)), got_g
    assert np.all(np.isfinite(got_h)), got_h
    assert np.max(np.abs(got_g)) > 1e30  # genuinely in the overflow regime

    # float64 oracle of the reference's stable expectation semantics
    pack = G.density_pack(state, jnp.asarray(samples))
    w64 = np.exp((comp_ld[0] - np.asarray(bg)).astype(np.float64)) / n
    lr_grads = (tgrads - np.asarray(pack.model_grads)).astype(np.float64)
    ptd = np.asarray(pack.prec_times_diff[0]).astype(np.float64)
    want_gneg = -(w64[:, None] * lr_grads).sum(0)
    want_hneg = -np.einsum("n,nd,ne->de", w64, lr_grads, ptd)
    np.testing.assert_allclose(got_g, want_gneg, rtol=1e-4)
    np.testing.assert_allclose(
        got_h, want_hneg, rtol=1e-3, atol=1e-4 * np.abs(want_hneg).max())


def test_more_estimator_quadratic_target_exact():
    """On an exactly quadratic target log p(x) = -0.5 x^T P x + x^T b, the
    MORE surrogate is exact: Hneg -> P - Sigma^{-1}-ish ratio fit.

    log ratio = log p - log q is quadratic; the fit recovers its coefficients,
    so Hneg = P - Sigma^{-1} and gneg = Hneg mu - (grad terms)."""
    rng = np.random.RandomState(4)
    d = 3
    mu = rng.randn(d).astype(np.float32) * 0.1
    cov = np.eye(d, dtype=np.float32) * 1.5
    state = _single_gaussian_state(mu, cov)

    p_prec = np.diag([1.0, 2.0, 0.5]).astype(np.float32)
    b = np.array([0.3, -0.1, 0.2], np.float32)

    def lnpdf(x):
        return -0.5 * np.einsum("ni,ij,nj->n", x, p_prec, x) + x @ b

    n = 4000
    samples = np.asarray(G.sample(state, jax.random.PRNGKey(5), n)[0])
    bg = G.log_density(state, jnp.asarray(samples))
    est = more_estimate(
        state, jnp.asarray(samples), jnp.ones(n, bool),
        jnp.zeros(n, jnp.int32), bg,
        jnp.asarray(lnpdf(samples), jnp.float32),
        l2_regularizers=jnp.full((state.max_components,), 1e-9),
    )
    # log ratio quad coefficient: -0.5(P - Sigma^{-1}) => quad_term = P - Sigma^{-1}
    want_hneg = p_prec - np.linalg.inv(cov)
    got_h = np.asarray(est.expected_hessians_neg[0])
    np.testing.assert_allclose(got_h, want_hneg, atol=0.05)

    # gneg = Hneg mu - lin_term; the log-ratio's linear term is b - Sigma^{-1} mu
    # (the -log q part contributes +0.5 x^T S^-1 x - x^T S^-1 mu)
    want_gneg = want_hneg @ mu - (b - np.linalg.inv(cov) @ mu)
    np.testing.assert_allclose(
        np.asarray(est.expected_gradients_neg[0]), want_gneg, atol=0.05
    )
