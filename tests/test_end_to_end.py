"""End-to-end convergence and resume tests on small analytic targets."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gmmvi_tpu.configs import get_default_algorithm_config, update_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.experiments.targets.gmm import make_simple_target, make_star_target
from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.optimization.gmmvi import GMMVI
from gmmvi_tpu.runner import GmmviRunner
from gmmvi_tpu.utils import checkpoint as ckpt


def _base_config(codename, target, n_des=24, ratio=1.0, kmax=8, k0=3, seed=0):
    cfg = get_default_algorithm_config(codename)
    return update_config(cfg, {
        "start_seed": seed, "seed": seed,
        "target_fn": target,
        "environment_name": "test",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": k0,
            "prior_mean": 0.0, "prior_scale": 3.0, "initial_cov": 4.0,
        },
        "use_sample_database": True, "max_database_size": 100000,
        "temperature": 1.0,
        "sample_selector_config": {
            "desired_samples_per_component": n_des,
            "ratio_reused_samples_to_desired": ratio,
        },
        "num_component_adapter_config": {
            "del_iters": 8, "add_iters": 5, "max_components": kmax,
            "thresholds_for_add_heuristic": [500.0, 100.0],
            "min_weight_for_del_heuristic": 1e-6,
            "num_database_samples": 256, "num_prior_samples": 0,
        } if cfg["num_component_adapter_type"] == "adaptive" else {},
        "gmmvi_runner_config": {"log_metrics_interval": 100},
        "tpu": {"max_components": kmax},
    })


def _elbo(gmmvi, target, seed=0, n=2000):
    samples, _ = G.sample(gmmvi.state.model, jax.random.PRNGKey(seed), n)
    return float(
        jnp.mean(target.log_density(samples))
        - jnp.mean(G.log_density(gmmvi.state.model, samples))
    )


def test_samtron_converges_on_simple_target():
    target = make_simple_target()
    cfg = _base_config("SAMTRON", target)
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    elbo0 = _elbo(gmmvi, target)
    for _ in range(40):
        gmmvi.train_iter()
    elbo = _elbo(gmmvi, target)
    assert elbo > elbo0 + 1.0
    assert elbo > -0.2  # target is normalized: optimum at 0


def test_sepyfux_converges():
    """SEPYFUX = Stein + fixed-K + mixture-based (Lin) + iBLR + decaying +
    direct weights + fixed weight stepsize."""
    target = make_simple_target()
    cfg = _base_config("SEPYFUX", target, n_des=64, ratio=0.0)
    cfg = update_config(cfg, {"component_stepsize_adapter_config": {
        "initial_stepsize": 0.05, "annealing_exponent": 0.2,
    }, "weight_stepsize_adapter_config": {"initial_stepsize": 0.5}})
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    elbo0 = _elbo(gmmvi, target)
    for _ in range(60):
        gmmvi.train_iter()
    assert _elbo(gmmvi, target) > elbo0 + 1.0


def test_zamtron_converges():
    """ZAMTRON: MORE estimator (zero-order) with VIPS machinery."""
    target = make_simple_target()
    cfg = _base_config("ZAMTRON", target, n_des=32)
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    elbo0 = _elbo(gmmvi, target)
    for _ in range(40):
        gmmvi.train_iter()
    assert _elbo(gmmvi, target) > elbo0 + 1.0


def test_adaptation_discovers_star_modes():
    target = make_star_target(4)
    cfg = _base_config("SAMTRON", target, n_des=24, kmax=12, k0=1)
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    for _ in range(60):
        gmmvi.train_iter()
    assert int(gmmvi.state.model.num_active) > 1
    assert _elbo(gmmvi, target) > -1.0


def test_deterministic_given_seed():
    target = make_simple_target()

    def run():
        cfg = _base_config("SAMTRON", target, seed=42)
        t, model, meta = init_experiment(cfg)
        gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
        for _ in range(5):
            gmmvi.train_iter()
        return np.asarray(gmmvi.state.model.means)

    np.testing.assert_array_equal(run(), run())


def test_checkpoint_resume_exact(tmp_path):
    target = make_simple_target()
    cfg = _base_config("SAMTRON", target, seed=7)
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    for _ in range(6):
        gmmvi.train_iter()
    path = str(tmp_path / "state.npz")
    ckpt.save_state(path, gmmvi.state)
    for _ in range(4):
        gmmvi.train_iter()
    final_a = np.asarray(gmmvi.state.model.means)

    # fresh instance, restore, continue
    t2, model2, meta2 = init_experiment(cfg)
    gmmvi2 = GMMVI.build_from_config(cfg, target, model2, meta2)
    gmmvi2.state = ckpt.load_state(path, gmmvi2.state)
    for _ in range(4):
        gmmvi2.train_iter()
    final_b = np.asarray(gmmvi2.state.model.means)
    np.testing.assert_array_equal(final_a, final_b)


def test_runner_on_host_target():
    """Host-target path (propose / eager target / update split)."""
    from gmmvi_tpu.experiments.targets.talos_ik import HostLNPDF

    def lnpdf(x):
        return -0.5 * np.sum((x - 1.0) ** 2, axis=1)

    def lnpdf_grad(x):
        return lnpdf(x), -(x - 1.0)

    target = HostLNPDF(2, lnpdf, lnpdf_grad)
    cfg = _base_config("SEMTRON", target, n_des=24)
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    for _ in range(30):
        gmmvi.train_iter()
    means = np.asarray(gmmvi.state.model.means[: int(gmmvi.state.model.num_active)])
    w = np.asarray(gmmvi.state.model.weights[: int(gmmvi.state.model.num_active)])
    mix_mean = (w[:, None] * means).sum(0)
    np.testing.assert_allclose(mix_mean, [1.0, 1.0], atol=0.3)


def test_bucketed_target_eval_matches_full():
    """Compact-then-evaluate (tpu.compact_target_eval) must not change the
    trajectory: only padded-row work is skipped, never valid-row values
    (the reference evaluates exactly the drawn samples,
    sample_selector.py:199-204)."""
    target = make_simple_target()

    def build(mode):
        cfg = _base_config("SAMTRON", target, n_des=24, ratio=2.0, kmax=8,
                           k0=3, seed=3)
        cfg = update_config(cfg, {"tpu": {"compact_target_eval": mode}})
        t, model, meta = init_experiment(cfg)
        return GMMVI.build_from_config(cfg, target, model, meta)

    g_on, g_off = build("on"), build("off")
    assert g_on._eval_buckets is not None and len(g_on._eval_buckets) >= 2
    assert g_off._eval_buckets is None
    # covers both regimes: early iters (all rows valid -> full bucket) and
    # steady state under reuse (few valid rows -> small bucket)
    for _ in range(12):
        g_on.train_iter()
        g_off.train_iter()
    np.testing.assert_allclose(
        np.asarray(g_on.state.model.means), np.asarray(g_off.state.model.means),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_on.state.model.log_weights),
        np.asarray(g_off.state.model.log_weights), rtol=1e-6, atol=1e-6)
    assert int(g_on.state.db.num_samples_written) == int(
        g_off.state.db.num_samples_written)


def test_checkpoint_rejects_structural_mismatch(tmp_path):
    """Path-keyed checkpoints fail loudly on structural drift (round-1
    checkpoints were positional and silently loaded wrong state)."""
    target = make_simple_target()
    cfg = _base_config("SAMTRON", target, kmax=8)
    t, model, meta = init_experiment(cfg)
    g = GMMVI.build_from_config(cfg, target, model, meta)
    for _ in range(3):
        g.train_iter()
    path = str(tmp_path / "ck.npz")
    ckpt.save_state(path, g.state)

    # same leaf COUNT but different capacity -> must raise, not permute
    cfg2 = _base_config("SAMTRON", target, kmax=16)
    t2, model2, meta2 = init_experiment(cfg2)
    g2 = GMMVI.build_from_config(cfg2, target, model2, meta2)
    with pytest.raises(ValueError, match="shapes differ|structure mismatch"):
        ckpt.load_state(path, g2.state)

    # a plain pytree with different paths -> must raise
    with pytest.raises(ValueError, match="structure mismatch"):
        ckpt.load_state(path, {"a": np.zeros(3)})


def test_decimate_db_mode_end_to_end():
    """tpu.db_eviction: decimate runs the full optimizer with the
    decimation-on-overflow database and still converges."""
    target = make_simple_target()
    cfg = _base_config("SAMTRON", target, n_des=16, ratio=2.0, kmax=4, k0=2,
                       seed=1)
    cfg = update_config(cfg, {
        "max_database_size": 256,   # small: forces decimation events
        "tpu": {"max_components": 4, "db_eviction": "decimate"},
    })
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    from gmmvi_tpu.optimization.sample_db_decimate import DecimatingDbState
    assert isinstance(gmmvi.state.db, DecimatingDbState)
    elbo0 = _elbo(gmmvi, target)
    for _ in range(40):
        gmmvi.train_iter()
    assert int(gmmvi.state.db.count) <= 256
    assert int(gmmvi.state.db.num_samples_written) > 256  # overflowed
    assert _elbo(gmmvi, target) > elbo0 + 1.0


def test_samtron_newton_search_converges():
    """The opt-in Newton trust-region search reaches the same optimum as the
    bisection on the simple target (PARITY_MAP: same trust-region contract,
    different visited etas)."""
    target = make_simple_target()
    cfg = _base_config("SAMTRON", target)
    cfg = update_config(cfg, {"tpu": {"trust_region_search": "newton"}})
    t, model, meta = init_experiment(cfg)
    gmmvi = GMMVI.build_from_config(cfg, target, model, meta)
    elbo0 = _elbo(gmmvi, target)
    for _ in range(40):
        gmmvi.train_iter()
    elbo = _elbo(gmmvi, target)
    assert elbo > elbo0 + 1.0
    assert elbo > -0.2
