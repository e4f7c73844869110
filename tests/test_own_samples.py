"""only_use_own_samples estimator mode (reference: ng_estimator.py:107-120)."""
import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.optimization.ng_estimators import stein_estimate


def test_own_samples_filters_by_mapping():
    rng = np.random.RandomState(0)
    k, d, n_per = 2, 3, 4000
    mu = np.stack([np.zeros(d), 10 * np.ones(d)]).astype(np.float32)
    covs = np.tile(np.eye(d, dtype=np.float32)[None], (k, 1, 1))
    state = G.create_gmm_state(np.ones(k, np.float32) / k, mu, covs,
                               max_components=k + 1)

    key = jax.random.PRNGKey(1)
    per_comp = G.sample_from_components(state, key, n_per)  # [K+1, n, D]
    samples = np.asarray(per_comp[:k]).reshape(-1, d)
    mapping = np.repeat(np.arange(k), n_per).astype(np.int32)
    n = len(samples)

    # target = standard normal around origin: grads known
    lnpdfs = -0.5 * np.sum(samples**2, axis=1)
    grads = -samples
    bg = G.log_density(state, jnp.asarray(samples))

    est = stein_estimate(
        state, jnp.asarray(samples), jnp.ones(n, bool),
        jnp.asarray(mapping), bg,
        jnp.asarray(lnpdfs.astype(np.float32)),
        jnp.asarray(grads.astype(np.float32)),
        use_self_normalized_importance_weights=True,
        only_use_own_samples=True,
    )
    # own-samples mode: component 0 only sees samples from component 0, with
    # uniform weights -> E[grad log ratio] for comp0 = E[-x + (x - mu0)] = 0
    # expected_grad = E_q0[grad p] - E_q0[grad q]; with own samples only and
    # log-IW == 0 this is the plain MC average over comp-0 draws.
    own0 = slice(0, n_per)
    want_g0 = -(grads[own0].mean(0) - np.asarray(
        G.density_pack(state, jnp.asarray(samples[own0])).model_grads
    ).mean(0))
    np.testing.assert_allclose(
        np.asarray(est.expected_gradients_neg[0]), want_g0, atol=0.05
    )

    # cross-check: component 1's estimate uses only its own distant samples
    est_sub = stein_estimate(
        state, jnp.asarray(samples[n_per:]), jnp.ones(n_per, bool),
        jnp.full(n_per, 1, jnp.int32), bg[n_per:],
        jnp.asarray(lnpdfs[n_per:].astype(np.float32)),
        jnp.asarray(grads[n_per:].astype(np.float32)),
        use_self_normalized_importance_weights=True,
        only_use_own_samples=True,
    )
    np.testing.assert_allclose(
        np.asarray(est.expected_gradients_neg[1]),
        np.asarray(est_sub.expected_gradients_neg[1]), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(est.expected_hessians_neg[1]),
        np.asarray(est_sub.expected_hessians_neg[1]), rtol=1e-4, atol=1e-5,
    )
