"""Pallas fused mixture-logpdf kernel vs the plain XLA path (interpret mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gmmvi_tpu.ops.pallas_kernels import (
    _plain_mixture_logpdf,
    fused_mixture_logpdf,
)


def _mixture(k, d, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.randn(k, d).astype(np.float32) * 2
    a = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    chols = np.linalg.cholesky(covs)
    inv_chols = np.linalg.inv(chols).astype(np.float32)
    log_dets = np.sum(np.log(np.diagonal(chols, axis1=-2, axis2=-1)),
                      axis=-1).astype(np.float32)
    lw = rng.dirichlet(np.ones(k)).astype(np.float32)
    return means, inv_chols, np.log(lw), log_dets


@pytest.mark.parametrize("k,d,n", [(3, 5, 70), (17, 20, 600)])
def test_fused_matches_plain(k, d, n):
    means, inv_chols, log_w, log_dets = _mixture(k, d)
    rng = np.random.RandomState(1)
    samples = (rng.randn(n, d) * 2).astype(np.float32)

    plain = np.asarray(_plain_mixture_logpdf(
        jnp.asarray(means), jnp.asarray(inv_chols), jnp.asarray(log_w),
        jnp.asarray(log_dets), jnp.asarray(samples),
    ))
    fused = np.asarray(fused_mixture_logpdf(
        jnp.asarray(means), jnp.asarray(inv_chols), jnp.asarray(log_w),
        jnp.asarray(log_dets), jnp.asarray(samples), interpret=True,
    ))
    np.testing.assert_allclose(fused, plain, rtol=1e-4, atol=1e-4)


def test_fused_handles_masked_components():
    k, d, n = 6, 4, 40
    means, inv_chols, log_w, log_dets = _mixture(k, d, seed=2)
    log_w[4:] = -np.inf  # masked slots
    rng = np.random.RandomState(3)
    samples = rng.randn(n, d).astype(np.float32)
    plain = np.asarray(_plain_mixture_logpdf(
        jnp.asarray(means[:4]), jnp.asarray(inv_chols[:4]),
        jnp.asarray(log_w[:4] - np.log(np.exp(log_w[:4]).sum())),
        jnp.asarray(log_dets[:4]), jnp.asarray(samples),
    ))
    lw_full = log_w.copy()
    lw_full[:4] -= np.log(np.exp(log_w[:4]).sum())
    fused = np.asarray(fused_mixture_logpdf(
        jnp.asarray(means), jnp.asarray(inv_chols), jnp.asarray(lw_full),
        jnp.asarray(log_dets), jnp.asarray(samples), interpret=True,
    ))
    np.testing.assert_allclose(fused, plain, rtol=1e-4, atol=1e-4)


def test_fused_density_pack_matches_xla():
    """The block-diagonal fused density kernel (interpret mode) matches the
    XLA density_pack: comp log-densities, mixture density, analytic grads."""
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.ops.pallas_density import (
        fused_component_densities, fused_density_pack,
    )

    rng = np.random.RandomState(0)
    k, kmax, n, d = 11, 16, 700, 5
    means = rng.randn(k, d).astype(np.float32) * 3
    a = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    w = rng.dirichlet(np.ones(k)).astype(np.float32)
    state = G.create_gmm_state(w, means, covs, max_components=kmax)
    x = jnp.asarray((rng.randn(n, d) * 2 + means[2]).astype(np.float32))

    pack = G.density_pack(state, x)
    logdets = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(
        state.chols, axis1=-2, axis2=-1))), -1)
    comp, model, grads = fused_density_pack(
        state.means, state.inv_chols, state.log_weights, logdets, x,
        interpret=True)
    np.testing.assert_allclose(np.asarray(comp[:k]),
                               np.asarray(pack.component_log_densities[:k]),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(model),
                               np.asarray(pack.model_log_densities), atol=5e-4)
    np.testing.assert_allclose(np.asarray(grads),
                               np.asarray(pack.model_grads), atol=5e-4)

    comp2, model2 = fused_component_densities(
        state.means, state.inv_chols, state.log_weights, logdets, x,
        interpret=True)
    np.testing.assert_allclose(np.asarray(comp2), np.asarray(comp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(model2), np.asarray(model),
                               atol=1e-6)


def test_stein_moment_form_matches_ptd_form():
    """Packs without prec_times_diff (fused-kernel packs) drive the Stein
    estimator through the moment form — must match the direct form."""
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization.ng_estimators import stein_estimate

    rng = np.random.RandomState(1)
    k, n, d = 5, 600, 4
    means = rng.randn(k, d).astype(np.float32) * 2 + 7.0  # off-origin
    a = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    state = G.create_gmm_state(np.full(k, 1.0 / k, np.float32), means, covs,
                               max_components=k)
    x = jnp.asarray((rng.randn(n, d) * 2 + 7.0).astype(np.float32))
    bg = jnp.asarray(rng.randn(n).astype(np.float32) - 4.0)
    lnp = jnp.asarray(rng.randn(n).astype(np.float32))
    grads = jnp.asarray(rng.randn(n, d).astype(np.float32))
    mask = jnp.ones(n, bool)
    mapping = jnp.asarray(rng.randint(0, k, n), jnp.int32)

    pack = G.density_pack(state, x)
    pack_no_ptd = pack.replace(prec_times_diff=None)
    for sniw in (True, False):
        e1 = stein_estimate(state, x, mask, mapping, bg, lnp, grads,
                            use_self_normalized_importance_weights=sniw,
                            pack=pack)
        e2 = stein_estimate(state, x, mask, mapping, bg, lnp, grads,
                            use_self_normalized_importance_weights=sniw,
                            pack=pack_no_ptd)
        np.testing.assert_allclose(np.asarray(e1.expected_gradients_neg),
                                   np.asarray(e2.expected_gradients_neg),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(e1.expected_hessians_neg),
                                   np.asarray(e2.expected_hessians_neg),
                                   rtol=1e-4, atol=1e-5)
