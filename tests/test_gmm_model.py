"""Model-layer tests: padded GMM ops vs scipy closed forms."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from gmmvi_tpu.models import gmm as G


def make_random_mixture(key, k, d, kmax=None, diagonal=False):
    rng = np.random.RandomState(key)
    weights = rng.dirichlet(np.ones(k)).astype(np.float32)
    means = rng.randn(k, d).astype(np.float32) * 3
    if diagonal:
        covs = rng.uniform(0.5, 2.0, (k, d)).astype(np.float32)
    else:
        a = rng.randn(k, d, d).astype(np.float32)
        covs = np.einsum("kij,klj->kil", a, a) + 0.5 * np.eye(d, dtype=np.float32)
    return weights, means, covs


@pytest.mark.parametrize("diagonal", [False, True])
@pytest.mark.parametrize("pad", [0, 5])
def test_component_log_densities_match_scipy(diagonal, pad):
    k, d = 4, 6
    weights, means, covs = make_random_mixture(0, k, d, diagonal=diagonal)
    state = G.create_gmm_state(weights, means, covs, max_components=k + pad,
                               diagonal=diagonal)
    rng = np.random.RandomState(1)
    x = rng.randn(17, d).astype(np.float32) * 2

    got = np.asarray(G.component_log_densities(state, jnp.asarray(x)))[:k]
    for i in range(k):
        cov = np.diag(covs[i]) if diagonal else covs[i]
        want = stats.multivariate_normal.logpdf(x, means[i], cov)
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("diagonal", [False, True])
def test_mixture_log_density_and_grad(diagonal):
    k, d = 3, 4
    weights, means, covs = make_random_mixture(2, k, d, diagonal=diagonal)
    state = G.create_gmm_state(weights, means, covs, max_components=k + 3,
                               diagonal=diagonal)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(9, d).astype(np.float32))

    ld, grads, comp = G.log_density_and_grad(state, x)

    # density vs scipy
    dens = np.zeros(9)
    for i in range(k):
        cov = np.diag(covs[i]) if diagonal else covs[i]
        dens += weights[i] * stats.multivariate_normal.pdf(np.asarray(x), means[i], cov)
    np.testing.assert_allclose(np.asarray(ld), np.log(dens), rtol=2e-4, atol=2e-4)

    # analytic grad vs autodiff of log_density
    auto = jax.vmap(jax.grad(lambda s: G.log_density(state, s[None])[0]))(x)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(auto), rtol=2e-3, atol=2e-3)


def test_marginal_log_density():
    k, d = 3, 5
    weights, means, covs = make_random_mixture(4, k, d)
    state = G.create_gmm_state(weights, means, covs, max_components=k + 2)
    rng = np.random.RandomState(5)
    x = rng.randn(11, d).astype(np.float32)
    for dim in [0, 3]:
        got = np.asarray(G.marginal_log_density(state, jnp.asarray(x), dim))
        dens = np.zeros(11)
        for i in range(k):
            dens += weights[i] * stats.norm.pdf(
                x[:, dim], means[i, dim], np.sqrt(covs[i][dim, dim])
            )
        np.testing.assert_allclose(got, np.log(dens), rtol=2e-4, atol=2e-4)


def test_entropies():
    k, d = 3, 4
    weights, means, covs = make_random_mixture(6, k, d)
    state = G.create_gmm_state(weights, means, covs, max_components=k + 1)
    ent = np.asarray(G.component_entropies(state))[:k]
    for i in range(k):
        want = stats.multivariate_normal(means[i], covs[i]).entropy()
        np.testing.assert_allclose(ent[i], want, rtol=1e-5)
    avg = float(G.average_entropy(state))
    np.testing.assert_allclose(avg, np.sum(weights * ent), rtol=1e-5)


def test_sampling_moments():
    k, d = 2, 3
    weights, means, covs = make_random_mixture(7, k, d)
    state = G.create_gmm_state(weights, means, covs, max_components=k + 2)
    key = jax.random.PRNGKey(0)
    samples, mapping = G.sample(state, key, 200_000)
    samples = np.asarray(samples)
    mapping = np.asarray(mapping)
    assert np.all(mapping < k)
    assert np.all(np.diff(mapping) >= 0)  # sorted mapping, aligned with samples
    # mixture mean
    mix_mean = np.sum(weights[:, None] * means, axis=0)
    np.testing.assert_allclose(samples.mean(0), mix_mean, atol=0.05)
    # per-component mean via mapping
    for i in range(k):
        np.testing.assert_allclose(samples[mapping == i].mean(0), means[i], atol=0.1)
    # empirical weights
    freq = np.bincount(mapping, minlength=k) / len(mapping)
    np.testing.assert_allclose(freq, weights, atol=0.01)


def test_sample_from_components():
    k, d = 3, 4
    weights, means, covs = make_random_mixture(8, k, d)
    state = G.create_gmm_state(weights, means, covs, max_components=k + 2)
    smp = G.sample_from_components(state, jax.random.PRNGKey(1), 50_000)
    smp = np.asarray(smp)
    assert smp.shape == (k + 2, 50_000, d)
    for i in range(k):
        np.testing.assert_allclose(smp[i].mean(0), means[i], atol=0.1)
        np.testing.assert_allclose(np.cov(smp[i].T), covs[i], atol=0.2)


def test_add_remove_components():
    k, d = 3, 3
    weights, means, covs = make_random_mixture(9, k, d)
    state = G.create_gmm_state(weights, means, covs, max_components=6)

    new_mean = jnp.ones(d)
    new_cov = 2.0 * jnp.eye(d)
    state2 = G.add_component(state, jnp.asarray(1e-29), new_mean, new_cov)
    assert int(state2.num_active) == k + 1
    np.testing.assert_allclose(np.asarray(state2.means[k]), np.ones(d))
    w = np.asarray(state2.weights)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert w[k] < 1e-20

    # remove the middle component
    keep = jnp.asarray([True, False, True, True, False, False])
    state3 = G.remove_components(state2, keep)
    assert int(state3.num_active) == k
    np.testing.assert_allclose(np.asarray(state3.means[1]), means[2], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state3.weights).sum(), 1.0, rtol=1e-6)

    # densities on active prefix unaffected by padding slots
    x = jnp.asarray(np.random.RandomState(0).randn(5, d).astype(np.float32))
    ld = G.log_density(state3, x)
    assert np.all(np.isfinite(np.asarray(ld)))


def test_full_state_is_jittable():
    k, d = 3, 3
    weights, means, covs = make_random_mixture(10, k, d)
    state = G.create_gmm_state(weights, means, covs, max_components=6)
    x = jnp.zeros((4, d))

    @jax.jit
    def f(s, x):
        pack = G.density_pack(s, x)
        return pack.model_log_densities.sum()

    assert np.isfinite(float(f(state, x)))


def test_component_log_density_and_grad():
    k, d = 3, 4
    weights, means, covs = make_random_mixture(11, k, d)
    state = G.create_gmm_state(weights, means, covs, max_components=k + 1)
    x = jnp.asarray(np.random.RandomState(1).randn(6, d).astype(np.float32))
    ld, grads = G.component_log_density_and_grad(state, 1, x)
    want = stats.multivariate_normal.logpdf(np.asarray(x), means[1], covs[1])
    np.testing.assert_allclose(np.asarray(ld), want, rtol=2e-4, atol=2e-4)
    auto = jax.vmap(jax.grad(
        lambda s: G.component_log_density_and_grad(state, 1, s[None])[0][0]
    ))(x)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(auto), rtol=2e-3,
                               atol=2e-3)
