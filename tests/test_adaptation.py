"""VIPS component adaptation: add and delete heuristics."""
import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.models import meta as M
from gmmvi_tpu.optimization import component_adaptation as A
from gmmvi_tpu.optimization import sample_db as DB

F32_MIN = np.finfo(np.float32).min


def _setup(k=2, d=2, kmax=6, del_iters=6):
    rng = np.random.RandomState(0)
    w = np.ones(k, np.float32) / k
    mu = rng.randn(k, d).astype(np.float32)
    covs = np.tile(np.eye(d, dtype=np.float32)[None], (k, 1, 1))
    model = G.create_gmm_state(w, mu, covs, max_components=kmax)
    meta = M.create_meta_state(model, 1.0, 1e-12, 2 * max(2, del_iters))
    cfg = A.VipsConfig(
        del_iters=del_iters, add_iters=3, max_components=kmax,
        thresholds_for_add_heuristic=(100.0, 50.0),
        min_weight_for_del_heuristic=1e-3,
        num_database_samples=16, num_prior_samples=0,
        prior_entropy=A.diagonal_gaussian_entropy(np.ones(d)),
    )
    return model, meta, cfg


def _filled_db(model, n_iters=3):
    db = DB.create_sample_db(2, model.max_components, 64, 4, 32)
    rng = np.random.RandomState(1)
    for it in range(n_iters):
        kmax = model.max_components
        b = kmax * 4
        samples = rng.randn(b, 2).astype(np.float32) * 3
        mapping = np.repeat(np.arange(kmax), 4).astype(np.int32)
        valid = mapping < int(model.num_active)
        lnpdfs = -0.5 * np.sum(samples**2, axis=1)  # peak at origin
        db = DB.add_samples(
            db, jnp.asarray(it), model, jnp.asarray(samples),
            jnp.asarray(valid), jnp.asarray(mapping),
            jnp.asarray(lnpdfs.astype(np.float32)),
            jnp.zeros((b, 2), jnp.float32), jax.random.PRNGKey(it),
        )
    return db


def test_add_new_component():
    model, meta, cfg = _setup()
    db = _filled_db(model)
    adapt = A.create_adaptation_state()
    m2, meta2, adapt2, db2 = A.add_new_component(
        model, meta, adapt, db, cfg, jax.random.PRNGKey(5)
    )
    assert int(m2.num_active) == 3
    assert int(adapt2.num_calls_to_add_heuristic) == 1
    # new component gets tiny weight, fresh meta state
    w = np.asarray(m2.weights)
    assert w[2] < 1e-20
    assert float(meta2.adding_thresholds[2]) == 100.0
    assert float(meta2.num_received_updates[2]) == 0.0
    assert int(meta2.unique_component_ids[2]) == int(meta.max_component_id) + 1
    # reward history reset for the new slot
    assert np.all(np.asarray(meta2.reward_history[2]) == F32_MIN)
    # the new covariance is isotropic
    cov = np.asarray(m2.covs[2])
    assert np.allclose(cov, cov[0, 0] * np.eye(2), rtol=1e-5)


def test_add_cycles_thresholds():
    model, meta, cfg = _setup()
    db = _filled_db(model)
    adapt = A.create_adaptation_state()
    m, mt, ad, db = A.add_new_component(model, meta, adapt, db, cfg,
                                        jax.random.PRNGKey(6))
    m, mt, ad, db = A.add_new_component(m, mt, ad, db, cfg,
                                        jax.random.PRNGKey(7))
    m, mt, ad, db = A.add_new_component(m, mt, ad, db, cfg,
                                        jax.random.PRNGKey(8))
    # thresholds cycle 100, 50, 100
    np.testing.assert_allclose(
        np.asarray(mt.adding_thresholds[2:5]), [100.0, 50.0, 100.0]
    )


def test_delete_bad_component():
    model, meta, cfg = _setup(k=3, del_iters=6)
    # component 2: stagnant low reward, tiny weight, old enough
    h = meta.history_length
    rh = np.full((model.max_components, h), F32_MIN, np.float32)
    wh = np.full((model.max_components, h), F32_MIN, np.float32)
    rh[0], rh[1] = 10.0, 9.0
    rh[2] = -50.0          # constant -> improvement 0 <= 0.4, stagnating
    wh[0], wh[1] = 0.5, 0.5
    wh[2] = 1e-7           # below min_weight 1e-3
    meta = meta.replace(reward_history=jnp.asarray(rh),
                        weight_history=jnp.asarray(wh))
    m2, meta2 = A.delete_bad_components(model, meta, cfg)
    assert int(m2.num_active) == 2
    # greedy weight of comp 2: exp(-50 - lse) ~ 0 -> deleted; 0,1 kept
    np.testing.assert_allclose(np.asarray(m2.means[:2]),
                               np.asarray(model.means[:2]))
    np.testing.assert_allclose(float(np.asarray(m2.weights).sum()), 1.0,
                               rtol=1e-6)


def test_delete_keeps_young_components():
    model, meta, cfg = _setup(k=3, del_iters=6)
    h = meta.history_length
    rh = np.full((model.max_components, h), F32_MIN, np.float32)
    wh = np.full((model.max_components, h), F32_MIN, np.float32)
    rh[0], rh[1] = 10.0, 9.0
    # comp 2 is bad but too young: only the last 3 entries are set
    rh[2, -3:] = -50.0
    wh[:3] = 0.3
    wh[2] = 1e-7
    meta = meta.replace(reward_history=jnp.asarray(rh),
                        weight_history=jnp.asarray(wh))
    m2, _ = A.delete_bad_components(model, meta, cfg)
    assert int(m2.num_active) == 3  # not old enough to delete


def test_adapt_gate_add_cadence():
    model, meta, cfg = _setup()
    db = _filled_db(model)
    adapt = A.create_adaptation_state()

    # iteration 3 (== add_iters) and > 1 -> add fires
    m, mt, ad, db2 = A.adapt_number_of_components(
        model, meta, adapt, db, cfg, jnp.asarray(3), jax.random.PRNGKey(9)
    )
    assert int(m.num_active) == 3
    # iteration 4: no add
    m2, _, ad2, _ = A.adapt_number_of_components(
        m, mt, ad, db2, cfg, jnp.asarray(4), jax.random.PRNGKey(10)
    )
    assert int(m2.num_active) == 3
    assert int(ad2.num_calls_to_add_heuristic) == 1


def test_adapt_respects_max_components():
    model, meta, cfg = _setup(kmax=3)
    cfg = cfg._replace(max_components=3)
    db = _filled_db(model)
    adapt = A.create_adaptation_state()
    m, mt, ad, db = A.adapt_number_of_components(
        model, meta, adapt, db, cfg, jnp.asarray(3), jax.random.PRNGKey(11)
    )
    assert int(m.num_active) == 3
    m2, _, _, _ = A.adapt_number_of_components(
        m, mt, ad, db, cfg, jnp.asarray(6), jax.random.PRNGKey(12)
    )
    assert int(m2.num_active) == 3  # at the cap: no further adds


def test_auto_repad_grows_past_initial_padding():
    """When VIPS fills the static padding but num_component_adapter's
    max_components still has headroom, the next add window triggers a loud
    host-side repad and growth continues (the reference grows its variables
    unboundedly, gmm_wrapper.py:90-127; round-1 behavior was a silent cap)."""
    import warnings

    from gmmvi_tpu.experiments.targets.gmm import make_star_target
    from gmmvi_tpu.experiments.setup import init_experiment
    from gmmvi_tpu.optimization.gmmvi import GMMVI
    from gmmvi_tpu.configs import get_default_algorithm_config, update_config

    target = make_star_target(num_components=5)
    cfg = get_default_algorithm_config("SAMTRON")
    cfg = update_config(cfg, {
        "start_seed": 0, "seed": 0, "target_fn": target,
        "environment_name": "star",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 2,
            "prior_mean": 0.0, "prior_scale": 3.0, "initial_cov": 1.0,
        },
        "use_sample_database": True, "max_database_size": 100000,
        "temperature": 1.0,
        "sample_selector_config": {
            "desired_samples_per_component": 16,
            "ratio_reused_samples_to_desired": 1.0,
        },
        "num_component_adapter_config": {
            "del_iters": 100, "add_iters": 2, "max_components": 12,
            "thresholds_for_add_heuristic": [100.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 128, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": 4},   # deliberately too small
    })
    t, model, meta = init_experiment(cfg)
    g = GMMVI.build_from_config(cfg, target, model, meta)
    assert g.state.model.max_components == 4

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        for _ in range(30):
            g.train_iter()
    grown = [w for w in caught if "repadding" in str(w.message)]
    assert grown, "expected a loud capacity-growth warning"
    assert g.state.model.max_components > 4
    assert int(g.state.model.num_active) > 4
    assert g.state.model.max_components <= 12
    # state stays sound after the relayout
    k = int(g.state.model.num_active)
    assert np.all(np.isfinite(np.asarray(g.state.model.means)[:k]))
    lw = np.asarray(g.state.model.log_weights)[:k]
    np.testing.assert_allclose(np.exp(lw).sum(), 1.0, rtol=1e-5)


def test_train_iters_matches_train_iter_across_repad():
    """Batched stepping must not silently defer adaptation: train_iters(n)
    chunks its lax.scan at add_iters boundaries while growth headroom exists,
    so its trajectory matches n x train_iter() exactly even when VIPS fills
    the static padding mid-run (the reference grows its variables unboundedly,
    gmm_wrapper.py:90-127, so batched and single stepping cannot diverge
    there)."""
    import warnings

    from gmmvi_tpu.experiments.targets.gmm import make_star_target
    from gmmvi_tpu.experiments.setup import init_experiment
    from gmmvi_tpu.optimization.gmmvi import GMMVI
    from gmmvi_tpu.configs import get_default_algorithm_config, update_config

    target = make_star_target(num_components=5)
    cfg = get_default_algorithm_config("SAMTRON")
    cfg = update_config(cfg, {
        "start_seed": 0, "seed": 0, "target_fn": target,
        "environment_name": "star",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 2,
            "prior_mean": 0.0, "prior_scale": 3.0, "initial_cov": 1.0,
        },
        "use_sample_database": True, "max_database_size": 100000,
        "temperature": 1.0,
        "sample_selector_config": {
            "desired_samples_per_component": 16,
            "ratio_reused_samples_to_desired": 1.0,
        },
        "num_component_adapter_config": {
            "del_iters": 100, "add_iters": 2, "max_components": 12,
            "thresholds_for_add_heuristic": [100.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 128, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": 4},   # deliberately too small
    })

    def build():
        t, model, meta = init_experiment(cfg)
        return GMMVI.build_from_config(cfg, target, model, meta)

    n = 30
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        g_single = build()
        for _ in range(n):
            g_single.train_iter()
        g_batched = build()
        g_batched.train_iters(13)   # odd split to misalign chunk boundaries
        g_batched.train_iters(n - 13)

    # both must have grown past the initial padding of 4
    assert int(g_single.state.model.num_active) > 4
    assert int(g_batched.state.model.num_active) == \
        int(g_single.state.model.num_active)
    assert int(g_batched.state.db.num_samples_written) == \
        int(g_single.state.db.num_samples_written)
    k = int(g_single.state.model.num_active)
    np.testing.assert_allclose(
        np.asarray(g_batched.state.model.means)[:k],
        np.asarray(g_single.state.model.means)[:k], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_batched.state.model.log_weights)[:k],
        np.asarray(g_single.state.model.log_weights)[:k],
        rtol=1e-5, atol=1e-5)


def test_repad_db_preserves_window():
    """repad_db must preserve get_newest_samples semantics exactly."""
    import jax
    import jax.numpy as jnp
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization import sample_db as db_ops

    rng = np.random.RandomState(0)
    d, kmax = 3, 4
    model = G.create_gmm_state(
        np.full(kmax, 1.0 / kmax, np.float32),
        rng.randn(kmax, d).astype(np.float32),
        np.tile(np.eye(d, dtype=np.float32)[None], (kmax, 1, 1)),
        max_components=kmax, diagonal=False,
    )
    db = db_ops.create_sample_db(
        dim=d, max_components=kmax, capacity=32, dist_ring_iters=4,
        reservoir_capacity=16, diagonal=False, keep_samples=True,
    )
    key = jax.random.PRNGKey(0)
    for it in range(3):
        b = 12
        samples = jnp.asarray(rng.randn(b, d).astype(np.float32))
        valid = jnp.asarray(rng.rand(b) < 0.8)
        mapping = jnp.asarray(rng.randint(0, kmax, b), jnp.int32)
        lnp = jnp.asarray(rng.randn(b).astype(np.float32))
        grads = jnp.asarray(rng.randn(b, d).astype(np.float32))
        key, k = jax.random.split(key)
        db = db_ops.add_samples(db, jnp.asarray(it), model, samples, valid,
                                mapping, lnp, grads, k)

    before = db_ops.get_newest_samples(db, 24, jnp.asarray(24), 16)
    db2 = db_ops.repad_db(db, new_max_components=8, new_capacity=64)
    assert db2.max_components == 8 and db2.capacity == 64
    after = db_ops.get_newest_samples(db2, 24, jnp.asarray(24), 16)
    v_b, v_a = np.asarray(before.valid), np.asarray(after.valid)
    np.testing.assert_array_equal(v_b, v_a)
    np.testing.assert_allclose(
        np.asarray(before.samples)[v_b], np.asarray(after.samples)[v_a])
    np.testing.assert_allclose(
        np.asarray(before.background_log_pdfs)[v_b],
        np.asarray(after.background_log_pdfs)[v_a], rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(before.mapping)[v_b], np.asarray(after.mapping)[v_a])
