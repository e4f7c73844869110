"""SPMD data-parallel tests on the virtual 8-device CPU mesh.

Strategy from SURVEY.md §4/§5: the same pjit code paths run on
xla_force_host_platform_device_count devices; per-component sufficient
statistics reduced over the mesh must match the single-device path.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gmmvi_tpu.configs import get_default_algorithm_config, update_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.experiments.targets.gmm import make_simple_target
from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.optimization.gmmvi import GMMVI
from gmmvi_tpu.optimization.ng_estimators import stein_estimate


requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))


@requires_multidevice
def test_stein_estimate_sharded_matches_replicated():
    rng = np.random.RandomState(0)
    k, d, n = 3, 4, 800
    w = np.ones(k, np.float32) / k
    mu = rng.randn(k, d).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32)
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    state = G.create_gmm_state(w, mu, covs, max_components=k + 1)

    samples = rng.randn(n, d).astype(np.float32)
    mask = np.ones(n, bool)
    mapping = np.repeat(np.arange(n // 200) % k, 200).astype(np.int32)
    bg = np.asarray(G.log_density(state, jnp.asarray(samples)))
    lnpdfs = rng.randn(n).astype(np.float32)
    grads = rng.randn(n, d).astype(np.float32)

    def run(shard):
        s = jnp.asarray(samples)
        g = jnp.asarray(grads)
        if shard:
            mesh = _mesh()
            s = jax.device_put(s, NamedSharding(mesh, P("data", None)))
            g = jax.device_put(g, NamedSharding(mesh, P("data", None)))
        est = jax.jit(stein_estimate, static_argnames=(
            "use_self_normalized_importance_weights", "only_use_own_samples"
        ))(
            state, s, jnp.asarray(mask), jnp.asarray(mapping),
            jnp.asarray(bg), jnp.asarray(lnpdfs), g,
            use_self_normalized_importance_weights=True,
        )
        return (np.asarray(est.expected_hessians_neg),
                np.asarray(est.expected_gradients_neg))

    h_rep, g_rep = run(False)
    h_sh, g_sh = run(True)
    np.testing.assert_allclose(h_sh, h_rep, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_sh, g_rep, rtol=1e-4, atol=1e-5)


def _build(mesh, seed=3, codename="SAMTRON"):
    target = make_simple_target()
    cfg = get_default_algorithm_config(codename)
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
            "num_database_samples": 128, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        # explicit global ring: these tests assert bit-level trajectory
        # equality sharded-vs-replicated, which needs the SAME (global) DB
        # semantics on both sides (the mesh default is the sharded layout,
        # whose reuse window deviates at iteration granularity)
        "tpu": {"max_components": 8, "db_layout": "global"},
    })
    t, model, meta = init_experiment(cfg)
    return target, GMMVI.build_from_config(cfg, target, model, meta, mesh=mesh)


@requires_multidevice
def test_full_training_step_sharded_matches_replicated():
    """The complete compiled training iteration with the sample batch sharded
    over 8 devices produces the same trajectory as the unsharded run."""
    _, gmmvi_rep = _build(mesh=None)
    _, gmmvi_sh = _build(mesh=_mesh())
    for _ in range(4):
        gmmvi_rep.train_iter()
        gmmvi_sh.train_iter()
    np.testing.assert_allclose(
        np.asarray(gmmvi_sh.state.model.means),
        np.asarray(gmmvi_rep.state.model.means),
        rtol=5e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(gmmvi_sh.state.model.log_weights[:3]),
        np.asarray(gmmvi_rep.state.model.log_weights[:3]),
        rtol=5e-4, atol=5e-4,
    )
    assert int(gmmvi_sh.state.model.num_active) == int(
        gmmvi_rep.state.model.num_active
    )


@requires_multidevice
def test_full_training_step_hybrid_mesh_matches_replicated():
    """The same trajectory on a 2-D ("data", "comp") 4x2 mesh: samples shard
    over data, the per-component update chains shard over comp."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "comp"))
    _, gmmvi_rep = _build(mesh=None)
    _, gmmvi_sh = _build(mesh=mesh)
    for _ in range(4):
        gmmvi_rep.train_iter()
        gmmvi_sh.train_iter()
    np.testing.assert_allclose(
        np.asarray(gmmvi_sh.state.model.means),
        np.asarray(gmmvi_rep.state.model.means),
        rtol=5e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(gmmvi_sh.state.model.log_weights[:3]),
        np.asarray(gmmvi_rep.state.model.log_weights[:3]),
        rtol=5e-4, atol=5e-4,
    )
    assert int(gmmvi_sh.state.model.num_active) == int(
        gmmvi_rep.state.model.num_active
    )


_KERNEL_VARS = ("GMMVI_FUSED_DENSITY", "GMMVI_FUSED_BACKGROUND",
                "GMMVI_FUSED_MORE", "GMMVI_FUSED_TR")


@requires_multidevice
@pytest.mark.parametrize("codename", ["SAMTRON", "ZAMTRON"])
def test_full_step_sharded_with_pallas_kernels_active(monkeypatch, codename):
    """The fused Pallas kernels stay ACTIVE under SPMD meshes: every kernel
    forced on in interpret mode, full-step trajectory equality between the
    8-device data mesh and the unsharded run (density pack, background,
    trust-region KL for SAMTRON; MORE Gram for ZAMTRON)."""
    for var in _KERNEL_VARS:
        monkeypatch.setenv(var, "interpret")
    _, gmmvi_rep = _build(mesh=None, codename=codename)
    _, gmmvi_sh = _build(mesh=_mesh(), codename=codename)
    for _ in range(3):
        gmmvi_rep.train_iter()
        gmmvi_sh.train_iter()
    np.testing.assert_allclose(
        np.asarray(gmmvi_sh.state.model.means),
        np.asarray(gmmvi_rep.state.model.means),
        rtol=5e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(gmmvi_sh.state.model.log_weights[:3]),
        np.asarray(gmmvi_rep.state.model.log_weights[:3]),
        rtol=5e-4, atol=5e-4,
    )
    assert int(gmmvi_sh.state.model.num_active) == int(
        gmmvi_rep.state.model.num_active
    )


@requires_multidevice
def test_fused_density_shard_map_wrap_matches_unwrapped(monkeypatch):
    """Direct check of the shard_map wrap: density_pack through the
    interpret kernel with a scoped SPMD mesh equals the unwrapped kernel
    and the XLA path; non-divisible batches report no shardable mesh."""
    monkeypatch.setenv("GMMVI_FUSED_DENSITY", "interpret")
    rng = np.random.RandomState(11)
    k, d, n = 3, 4, 640
    w = np.ones(k, np.float32) / k
    mu = rng.randn(k, d).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32)
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    state = G.create_gmm_state(w, mu, covs, max_components=k + 1)
    samples = jnp.asarray(rng.randn(n, d).astype(np.float32))

    plain = G.density_pack(state, samples)
    mesh = _mesh()
    with G.spmd_scope(mesh):
        assert G.spmd_data_mesh(n) is mesh
        assert G.spmd_data_mesh(n + 1) is None  # not evenly shardable
        sharded = jax.jit(lambda st, s: G.density_pack(st, s))(state, samples)
    np.testing.assert_allclose(
        np.asarray(sharded.model_log_densities),
        np.asarray(plain.model_log_densities), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sharded.model_grads), np.asarray(plain.model_grads),
        rtol=2e-4, atol=1e-4)
    assert G.spmd_data_mesh(n) is None  # scope restored


@requires_multidevice
def test_hybrid_mesh_helper():
    from gmmvi_tpu.parallel.mesh import hybrid_mesh

    mesh = hybrid_mesh(num_comp=2, num_devices=8)
    assert mesh.axis_names == ("data", "comp")
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError, match="not divisible"):
        hybrid_mesh(num_comp=3, num_devices=8)


@requires_multidevice
def test_dryrun_multichip_entry():
    import __graft_entry__ as entry

    entry.dryrun_multichip(8)


@requires_multidevice
def test_spmd_gate_does_not_leak_across_instances():
    """Regression: constructing/running a meshed GMMVI must not leave the
    process-global Pallas-kernel gate (gmm.SPMD_ACTIVE) set, which would
    silently disable the fused kernels for later unmeshed instances."""
    from gmmvi_tpu.models import gmm as G

    assert G.SPMD_ACTIVE is False
    _, gmmvi_sh = _build(mesh=_mesh())
    gmmvi_sh.train_iter()
    assert G.SPMD_ACTIVE is False  # scoped to the trace, not set-once
    # the scope wrapper reports the right value while tracing
    seen = []
    orig = gmmvi_sh._full_step

    def probe(state):
        seen.append(G.SPMD_ACTIVE)
        return orig(state)

    jax.jit(gmmvi_sh._spmd_scoped(probe))(gmmvi_sh.state)
    assert seen == [True]

    _, gmmvi_rep = _build(mesh=None)
    seen2 = []

    def probe2(state):
        seen2.append(G.SPMD_ACTIVE)
        return gmmvi_rep._full_step(state)

    jax.jit(gmmvi_rep._spmd_scoped(probe2))(gmmvi_rep.state)
    assert seen2 == [False]


@requires_multidevice
def test_mesh_from_config_yaml_knobs():
    """tpu.data_shards / tpu.comp_shards build the right meshes, and the
    runner picks them up from the config without a programmatic mesh."""
    from gmmvi_tpu.parallel.mesh import mesh_from_config

    assert mesh_from_config({}) is None
    m = mesh_from_config({"data_shards": 8})
    assert m.axis_names == ("data",) and m.devices.shape == (8,)
    m = mesh_from_config({"data_shards": 4, "comp_shards": 2})
    assert m.axis_names == ("data", "comp") and m.devices.shape == (4, 2)
    m = mesh_from_config({"data_shards": "all", "comp_shards": 2})
    assert m.devices.shape == (4, 2)
    with pytest.raises(ValueError, match="devices"):
        mesh_from_config({"data_shards": 16})

    # end to end through the runner (tiny shapes, a couple of iterations)
    from gmmvi_tpu.runner import GmmviRunner
    from gmmvi_tpu.experiments.targets.gmm import make_simple_target
    from gmmvi_tpu.configs import get_default_algorithm_config, update_config

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
            "thresholds_for_add_heuristic": [500.0, 100.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 128, "num_prior_samples": 0,
        },
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": 8, "data_shards": 4, "comp_shards": 2},
    })
    runner = GmmviRunner.build_from_config(cfg)
    assert runner.gmmvi.mesh is not None
    assert runner.gmmvi.mesh.axis_names == ("data", "comp")
    runner.iterate_and_log(0)


@requires_multidevice
def test_mesh_requires_data_axis():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("batch",))
    with pytest.raises(ValueError, match="must include 'data'"):
        _build(mesh=mesh)


@requires_multidevice
def test_fused_stein_smom_shard_map_wrap_matches_einsum(monkeypatch):
    """The streamed Stein second-moment kernel under a scoped SPMD mesh:
    per-shard kernel passes + psum'd [K, D, D] partials equal the plain
    einsum (D>64 engages the kernel; see pallas_stein.supports)."""
    from gmmvi_tpu.optimization.ng_estimators import _stein_smom

    monkeypatch.setenv("GMMVI_FUSED_STEIN", "interpret")
    rng = np.random.RandomState(13)
    k, d, n = 5, 96, 640
    w_mix = np.ones(k, np.float32) / k
    mu = rng.randn(k, d).astype(np.float32)
    covs = np.broadcast_to(np.eye(d, dtype=np.float32), (k, d, d)).copy()
    state = G.create_gmm_state(w_mix, mu, covs, max_components=k)

    w = rng.rand(k, n).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    g = jnp.asarray(rng.randn(n, d).astype(np.float32))
    xc = jnp.asarray(rng.randn(n, d).astype(np.float32))
    want = np.einsum("kn,nd,ne->kde", w, np.asarray(g), np.asarray(xc))

    mesh = _mesh()
    with G.spmd_scope(mesh):
        got = jax.jit(lambda a, b, c: _stein_smom(state, a, b, c))(
            jnp.asarray(w), g, xc)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
