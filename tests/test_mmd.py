"""MMD evaluation: math checks and the runner wiring."""
import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.experiments.evaluation.mmd import MMD


def test_mmd_zero_for_identical_samples():
    rng = np.random.RandomState(0)
    x = rng.randn(400, 3).astype(np.float32)
    mmd = MMD(x, alpha=2.0)
    val = mmd.compute_MMD(x)
    # identical sample: the U-statistics cancel exactly
    np.testing.assert_allclose(val, 0.0, atol=1e-5)


def test_mmd_orders_distributions_by_distance():
    rng = np.random.RandomState(1)
    gt = rng.randn(500, 2).astype(np.float32)
    near = (rng.randn(500, 2) + 0.2).astype(np.float32)
    far = (rng.randn(500, 2) + 3.0).astype(np.float32)
    mmd = MMD(gt, alpha=2.0)
    assert mmd.compute_MMD(near) < mmd.compute_MMD(far)
    assert mmd.compute_MMD(far) > 0


def test_runner_mmd_wiring(tmp_path):
    from gmmvi_tpu.configs import get_default_algorithm_config, update_config
    from gmmvi_tpu.experiments.targets.gmm import make_simple_target
    from gmmvi_tpu.runner import GmmviRunner

    target = make_simple_target()
    gt = np.asarray(target.sample(jax.random.PRNGKey(0), 800))
    sample_path = str(tmp_path / "gt.npy")
    np.save(sample_path, gt)

    cfg = get_default_algorithm_config("SEMTRON")
    cfg = update_config(cfg, {
        "start_seed": 0, "target_fn": target, "environment_name": "simple",
        "model_initialization": {
            "use_diagonal_covs": False, "num_initial_components": 2,
            "prior_mean": 0.0, "prior_scale": 2.0, "initial_cov": 2.0,
        },
        "use_sample_database": True, "max_database_size": 10000,
        "temperature": 1.0,
        "sample_selector_config": {"desired_samples_per_component": 16,
                                   "ratio_reused_samples_to_desired": 0.0},
        "gmmvi_runner_config": {"log_metrics_interval": 5},
        "mmd_evaluation_config": {"alpha": 2.0, "sample_dir": sample_path},
        "tpu": {"max_components": 2},
    })
    runner = GmmviRunner.build_from_config(cfg)
    mmd0 = None
    for n in range(11):
        out = runner.iterate_and_log(n)
        if "MMD" in out:
            if mmd0 is None:
                mmd0 = out["MMD"]
            mmd_last = out["MMD"]
    assert mmd0 is not None
    # training decreases the discrepancy to the target's ground-truth sample
    assert mmd_last < mmd0


def test_planar_robot_grid_visualizers():
    """Multi-arm sample visualizers (reference: visualize_planar_robot.py:32-106)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gmmvi_tpu.experiments.evaluation.visualize_planar_robot import (
        visualize_n_link_multi, visualize_samples_multi,
        visualize_samples_multi_grid,
    )

    rng = np.random.RandomState(0)
    num_arms, num_links, num_goals = 2, 5, 4
    samples = rng.randn(6, num_arms * num_links) * 0.3

    fig, ax = plt.subplots()
    visualize_n_link_multi(samples[0], np.ones(num_links), num_goals,
                           num_arms, num_links, ax=ax)
    visualize_samples_multi(samples, num_goals, num_arms, num_links, ax=ax)
    plt.close(fig)

    grid_fig = visualize_samples_multi_grid(samples, num_goals, num_arms,
                                            num_links, grid=(2, 3))
    assert len(grid_fig.axes) == 6
    plt.close(grid_fig)


def test_make_target_with_scale():
    """(reference: gmm.py:148-160)"""
    import jax.numpy as jnp

    from gmmvi_tpu.experiments.targets.gmm import make_target_with_scale

    t = make_target_with_scale(num_dimensions=4, num_components=6, scale=2.0,
                               seed=0)
    assert t.get_num_dimensions() == 4
    x = np.random.RandomState(1).randn(5, 4).astype(np.float32)
    ld = np.asarray(t.log_density(jnp.asarray(x)))
    assert ld.shape == (5,) and np.all(np.isfinite(ld))
