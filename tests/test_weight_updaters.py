"""Weight updater and stepsize adapter tests."""
import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.models import meta as M
from gmmvi_tpu.optimization import stepsize_adapters as S
from gmmvi_tpu.optimization.weight_updaters import (
    direct_weight_update,
    expected_log_ratios,
    trust_region_weight_update,
)


def _setup(k=3, d=2, kmax=5, seed=0):
    rng = np.random.RandomState(seed)
    w = rng.dirichlet(np.ones(k)).astype(np.float32)
    mu = rng.randn(k, d).astype(np.float32) * 2
    covs = np.tile(np.eye(d, dtype=np.float32)[None], (k, 1, 1))
    model = G.create_gmm_state(w, mu, covs, max_components=kmax)
    meta = M.create_meta_state(model, 1.0, 1e-12, 4)
    return model, meta


def test_direct_weight_update_formula():
    model, meta = _setup()
    elr = jnp.asarray([1.0, 0.0, -1.0, 0.0, 0.0])
    stepsize = 0.5
    new_model, new_meta = direct_weight_update(model, meta, elr, stepsize, 1.0)
    lw = np.asarray(model.log_weights[:3])
    want = lw + stepsize * np.asarray(elr[:3])
    want = want - np.log(np.exp(want).sum())
    np.testing.assert_allclose(
        np.asarray(new_model.log_weights[:3]), want, rtol=1e-5, atol=1e-5
    )
    # weight history appended
    np.testing.assert_allclose(
        np.asarray(new_meta.weight_history[:3, -1]),
        np.exp(want), rtol=1e-5,
    )


def test_direct_weight_update_skipped_for_single_component():
    model, meta = _setup(k=1, kmax=3)
    elr = jnp.asarray([5.0, 0.0, 0.0])
    new_model, new_meta = direct_weight_update(model, meta, elr, 1.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(new_model.log_weights), np.asarray(model.log_weights)
    )
    # history untouched too (reference skips replace_weights entirely)
    np.testing.assert_allclose(
        np.asarray(new_meta.weight_history), np.asarray(meta.weight_history)
    )


def test_trust_region_weight_update_kl_bound():
    model, meta = _setup(seed=1)
    elr = jnp.asarray([3.0, -1.0, 0.5, 0.0, 0.0])
    bound = 0.01
    new_model, _ = trust_region_weight_update(model, meta, elr, bound, 1.0)
    old_w = np.asarray(model.weights[:3])
    new_w = np.asarray(new_model.weights[:3])
    kl = np.sum(new_w * (np.log(new_w) - np.log(old_w)))
    assert kl < 1.2 * bound
    assert not np.allclose(old_w, new_w)  # it did move


def test_expected_log_ratios_gaussian():
    """Single standard-normal component, target = same density => ratios ~ 0
    after subtracting entropy terms; check against direct MC."""
    model, meta = _setup(k=2, seed=2)
    n = 20000
    key = jax.random.PRNGKey(0)
    samples, _ = G.sample(model, key, n)
    bg = G.log_density(model, samples)
    target = bg + 1.234  # unnormalized copy of the model itself

    elr, new_meta = expected_log_ratios(
        model, meta, samples, jnp.ones(n, bool), bg, target,
        temperature=1.0, use_self_normalized_importance_weights=True,
    )
    # E_{q(x|o)}[log p - log q] = 1.234 for every component
    np.testing.assert_allclose(np.asarray(elr[:2]), 1.234, atol=0.05)
    # rewards stored: log w + elr
    want = np.asarray(model.log_weights[:2]) + np.asarray(elr[:2])
    np.testing.assert_allclose(
        np.asarray(new_meta.reward_history[:2, -1]), want, rtol=1e-5
    )


def test_expected_log_ratios_standard_iw():
    model, meta = _setup(k=2, seed=3)
    n = 30000
    samples, _ = G.sample(model, jax.random.PRNGKey(1), n)
    bg = G.log_density(model, samples)
    target = bg + 0.5
    elr, _ = expected_log_ratios(
        model, meta, samples, jnp.ones(n, bool), bg, target,
        temperature=1.0, use_self_normalized_importance_weights=False,
    )
    np.testing.assert_allclose(np.asarray(elr[:2]), 0.5, atol=0.1)


def test_component_stepsize_adapters():
    model, meta = _setup()
    cfg_imp = dict(initial_stepsize=1.0, min_stepsize=0.001, max_stepsize=1.0,
                   stepsize_inc_factor=1.15, stepsize_dec_factor=0.85)
    # craft reward history: comp 0 improved, comp 1 declined
    rh = np.array(meta.reward_history)
    rh[0, -2], rh[0, -1] = 1.0, 2.0
    rh[1, -2], rh[1, -1] = 2.0, 1.0
    meta = meta.replace(reward_history=jnp.asarray(rh),
                        stepsizes=jnp.full((5,), 0.5))
    new = np.asarray(
        S.improvement_based_component_stepsize(meta, cfg_imp)
    )
    np.testing.assert_allclose(new[0], 0.575, rtol=1e-5)  # 0.5 * 1.15
    np.testing.assert_allclose(new[1], 0.425, rtol=1e-5)  # 0.5 * 0.85

    meta2 = meta.replace(num_received_updates=jnp.asarray([0., 4., 0., 0., 0.]))
    dec = np.asarray(
        S.decaying_component_stepsize(
            meta2, dict(initial_stepsize=1.0, annealing_exponent=0.5)
        )
    )
    np.testing.assert_allclose(dec[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(dec[1], 1.0 / 3.0, rtol=1e-5)

    fixed = np.asarray(S.fixed_component_stepsize(meta, {}))
    np.testing.assert_allclose(fixed, np.asarray(meta.stepsizes))


def test_weight_stepsize_adapters():
    model, meta = _setup()
    st = S.create_weight_stepsize_state(1.0)

    st_f = S.fixed_weight_stepsize(st, model, meta, dict(initial_stepsize=1.0))
    assert float(st_f.stepsize) == 1.0

    cfg_d = dict(initial_stepsize=1.0, annealing_exponent=0.5)
    st_d = S.decaying_weight_stepsize(st, model, meta, cfg_d)
    np.testing.assert_allclose(float(st_d.stepsize), 1.0)
    st_d2 = S.decaying_weight_stepsize(st_d, model, meta, cfg_d)
    np.testing.assert_allclose(float(st_d2.stepsize), 0.5)

    cfg_i = dict(initial_stepsize=1.0, min_stepsize=1e-4, max_stepsize=1.0,
                 stepsize_inc_factor=1.15, stepsize_dec_factor=0.85)
    rh = np.array(meta.reward_history)
    rh[:, -1] = 1.0
    meta_i = meta.replace(reward_history=jnp.asarray(rh))
    st0 = S.create_weight_stepsize_state(0.5)
    st1 = S.improvement_based_weight_stepsize(st0, model, meta_i, cfg_i)
    # first call: elbo > float32.min -> increase
    np.testing.assert_allclose(float(st1.stepsize), 0.575, rtol=1e-5)
    # same elbo -> not improved -> decrease
    st2 = S.improvement_based_weight_stepsize(st1, model, meta_i, cfg_i)
    np.testing.assert_allclose(float(st2.stepsize), 0.575 * 0.85, rtol=1e-5)
