"""Target-distribution zoo tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from gmmvi_tpu.experiments.setup import construct_initial_mixture, init_experiment
from gmmvi_tpu.experiments.targets.gmm import (
    make_diag_target,
    make_simple_target,
    make_star_target,
    make_target,
)
from gmmvi_tpu.experiments.targets.logistic_regression import (
    make_breast_cancer,
    make_breast_cancer_mb,
    make_german_credit,
)
from gmmvi_tpu.experiments.targets.planar_robot import make_four_goal, make_single_goal
from gmmvi_tpu.experiments.targets.student_t_mixture import make_target as make_stm
from gmmvi_tpu.experiments.targets.talos_ik import HostLNPDF


def test_student_t_log_density_vs_scipy():
    stm = make_stm(num_dimensions=3, harder_setting=False, seed=0)
    rng = np.random.RandomState(1)
    x = (rng.randn(20, 3) * 5).astype(np.float32)
    got = np.asarray(stm.log_density(jnp.asarray(x)))
    dens = np.zeros(20)
    for wk, mk, ck in zip(stm.target_weights, stm.target_means,
                          stm.target_covs):
        dens += wk * stats.multivariate_t.pdf(x, loc=mk, shape=ck, df=2)
    np.testing.assert_allclose(got, np.log(dens), rtol=1e-4, atol=1e-4)


def test_student_t_marginal_and_sampling():
    stm = make_stm(num_dimensions=2, harder_setting=False, seed=2)
    x = np.linspace(-30, 30, 101)[:, None] * np.ones((1, 2))
    marg = np.asarray(stm.marginal_log_density(jnp.asarray(x, jnp.float32), 0))
    dens = np.zeros(101)
    for wk, mk, ck in zip(stm.target_weights, stm.target_means,
                          stm.target_covs):
        dens += wk * stats.t.pdf(x[:, 0], df=2, loc=mk[0],
                                 scale=np.sqrt(ck[0, 0]))
    np.testing.assert_allclose(marg, np.log(dens), rtol=1e-4, atol=1e-4)

    smp = np.asarray(stm.sample(jax.random.PRNGKey(0), 50000))
    assert smp.shape == (50000, 2)
    # median is robust for df=2; compare against the mixture's weighted medians
    assert np.all(np.abs(np.median(smp, 0)) < 25)


def test_gmm_targets():
    for target in [make_target(4, seed=0), make_diag_target(4, seed=1),
                   make_simple_target(), make_star_target(5)]:
        d = target.get_num_dimensions()
        x = np.random.RandomState(0).randn(7, d).astype(np.float32)
        ld = np.asarray(target.log_density(jnp.asarray(x)))
        assert ld.shape == (7,) and np.all(np.isfinite(ld))
        assert target.can_sample()
        smp = target.sample(jax.random.PRNGKey(1), 16)
        assert np.asarray(smp).shape == (16, d)


def test_logistic_regression_density_and_grad():
    target = make_breast_cancer()
    d = target.get_num_dimensions()
    assert d == 31
    rng = np.random.RandomState(0)
    theta = (rng.randn(4, d) * 0.05).astype(np.float32)
    ld, grads = target.log_density_and_grad(jnp.asarray(theta))
    assert np.all(np.isfinite(np.asarray(ld)))
    # numerical gradient check on one coordinate
    eps = 1e-3
    tp = theta.copy(); tp[0, 5] += eps
    tm = theta.copy(); tm[0, 5] -= eps
    num = (
        float(target.log_density(jnp.asarray(tp))[0])
        - float(target.log_density(jnp.asarray(tm))[0])
    ) / (2 * eps)
    np.testing.assert_allclose(float(grads[0, 5]), num, rtol=2e-2, atol=2e-2)

    gc = make_german_credit()
    assert gc.get_num_dimensions() == 25


def test_logistic_regression_minibatch():
    target = make_breast_cancer_mb(batch_size=32, size_test_set=0,
                                   use_own_batch_per_sample=True)
    assert not target.safe_for_jit
    theta = np.zeros((3, target.get_num_dimensions()), np.float32)
    ld = np.asarray(target.log_density(jnp.asarray(theta)))
    assert ld.shape == (3,) and np.all(np.isfinite(ld))
    # full-batch evaluation close to the full-batch target at theta=0
    fb = np.asarray(target.log_density_fb(jnp.asarray(theta)))
    full = make_breast_cancer()
    want = np.asarray(full.log_density(jnp.asarray(theta)))
    np.testing.assert_allclose(fb, want, rtol=1e-5)
    # minibatch estimate is unbiased-ish: N * mean batch loglik ~ full loglik
    many = np.stack([
        np.asarray(target.log_density(jnp.asarray(theta)))
        for _ in range(30)
    ])
    np.testing.assert_allclose(many.mean(), want.mean(), rtol=0.05)


def test_planar_robot():
    for target, ngoals in [(make_single_goal(), 1), (make_four_goal(), 4)]:
        assert target.get_num_dimensions() == 10
        theta = np.zeros((2, 10), np.float32)
        ld = np.asarray(target.log_density(jnp.asarray(theta)))
        assert np.all(np.isfinite(ld))
        # stretched-out arm reaches (10, 0): distance 3 from goal (7,0)
        pos = np.asarray(target.forward_kinematics(jnp.asarray(theta)))
        np.testing.assert_allclose(pos[0], [10.0, 0.0], atol=1e-5)
        # gradient via autodiff (default path) works
        _, grads = target.log_density_and_grad(jnp.asarray(theta))
        assert np.all(np.isfinite(np.asarray(grads)))


def test_planar_robot_likelihood_max_over_goals():
    target = make_four_goal()
    pos = jnp.asarray([[7.0, 0.0], [0.0, -7.0], [3.0, 3.0]])
    lik = np.asarray(target.likelihood(pos))
    # at a goal: peak density of N(goal, 1e-4 I)
    want_peak = -np.log(2 * np.pi) - 2 * np.log(1e-2)
    np.testing.assert_allclose(lik[0], want_peak, rtol=1e-5)
    np.testing.assert_allclose(lik[1], want_peak, rtol=1e-5)
    assert lik[2] < lik[0]


def test_bnn_wine_target():
    from gmmvi_tpu.experiments.targets.bnn import make_WINE_target

    target = make_WINE_target(likelihood_scaling=1.0, dataset_seed=0,
                              prior_std=1.0, batch_size=64)
    d = target.get_num_dimensions()
    assert d == 11 * 8 + 8 + 8 * 8 + 8 + 8 * 1 + 1
    assert target.use_log_density_and_grad and not target.safe_for_jit
    x = (np.random.RandomState(0).randn(3, d) * 0.1).astype(np.float32)
    ld, grads = target.log_density_and_grad(jnp.asarray(x))
    assert np.asarray(ld).shape == (3,)
    assert np.all(np.isfinite(np.asarray(ld)))
    assert np.all(np.isfinite(np.asarray(grads)))

    model = construct_initial_mixture(d, 1, 0.0, 1.0, False, 1.0)
    metrics = target.expensive_metrics(model, jnp.asarray(x))
    assert "bi_test_loss" in metrics and "bi_vali_rmse" in metrics


def test_host_lnpdf_escape_hatch():
    def rosenbrock(x):
        a, b = 1.0, 100.0
        return -((a - x[:, 0]) ** 2 + b * (x[:, 1] - x[:, 0] ** 2) ** 2)

    def rosenbrock_grad(x):
        a, b = 1.0, 100.0
        gx = -(-2 * (a - x[:, 0]) - 4 * b * (x[:, 1] - x[:, 0] ** 2) * x[:, 0])
        gy = -(2 * b * (x[:, 1] - x[:, 0] ** 2))
        return rosenbrock(x), np.stack([gx, gy], axis=1)

    target = HostLNPDF(2, rosenbrock, rosenbrock_grad)
    assert not target.safe_for_jit and target.use_log_density_and_grad
    x = np.asarray([[1.0, 1.0], [0.0, 0.0]], np.float32)
    ld, grads = target.log_density_and_grad(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ld), [0.0, -1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads)[0], [0.0, 0.0], atol=1e-5)


def test_init_experiment_registry():
    from gmmvi_tpu.configs import get_default_experiment_config

    cfg = get_default_experiment_config("gmm20")
    cfg["environment_config"]["num_dimensions"] = 3
    cfg["seed"] = 0
    cfg["num_component_adapter_type"] = "fixed"
    cfg["num_component_adapter_config"] = {}
    cfg["component_stepsize_adapter_config"] = {"initial_stepsize": 0.1}
    target, model, meta = init_experiment(cfg)
    assert target.get_num_dimensions() == 3
    assert int(model.num_active) == 1
    # single initial component is placed at the prior mean
    np.testing.assert_allclose(np.asarray(model.means[0]), 0.0, atol=1e-6)
    cov = np.asarray(model.covs[0])
    np.testing.assert_allclose(cov, 1000.0 * np.eye(3), rtol=1e-5)


def test_analytic_target_grads_match_autodiff():
    """Analytic log_density_and_grad (STM / GMM / logistic regression) must
    match per-sample reverse-mode AD of log_density (the round-1 path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmmvi_tpu.experiments.targets.gmm import make_target as make_gmm
    from gmmvi_tpu.experiments.targets.logistic_regression import (
        make_breast_cancer,
    )
    from gmmvi_tpu.experiments.targets.student_t_mixture import (
        make_target as make_stm,
    )

    rng = np.random.RandomState(0)
    targets = [
        (make_stm(num_dimensions=6, harder_setting=False, seed=1), 6, 3.0),
        (make_gmm(num_dimensions=5, seed=2), 5, 30.0),
        (make_breast_cancer(), None, 0.3),
    ]
    for target, d, spread in targets:
        assert target.use_log_density_and_grad
        d = d or target.get_num_dimensions()
        x = jnp.asarray(rng.randn(64, d).astype(np.float32) * spread)
        ld, grad = target.log_density_and_grad(x)
        ld_ad, grad_ad = jax.vmap(
            jax.value_and_grad(lambda s: target.log_density(s[None])[0])
        )(x)
        np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_ad),
                                   rtol=2e-5, atol=2e-5)
        scale = np.maximum(np.abs(np.asarray(grad_ad)), 1.0)
        np.testing.assert_allclose(np.asarray(grad) / scale,
                                   np.asarray(grad_ad) / scale,
                                   rtol=3e-4, atol=3e-4)


def test_mnist_loader_accepts_keras_archive(tmp_path, monkeypatch):
    """The loader resolves a standard keras-schema mnist.npz (x_train
    [N, 28, 28] uint8 — what scripts/fetch_mnist.py downloads) without
    GMMVI_ALLOW_SYNTHETIC, normalizing to flat [N, 784] float in [0, 1]."""
    import numpy as np

    from gmmvi_tpu.experiments.targets import datasets as data_lib

    rng = np.random.RandomState(0)
    np.savez(tmp_path / "mnist.npz",
             x_train=rng.randint(0, 256, (32, 28, 28)).astype(np.uint8),
             y_train=rng.randint(0, 10, 32).astype(np.uint8),
             x_test=rng.randint(0, 256, (8, 28, 28)).astype(np.uint8),
             y_test=rng.randint(0, 10, 8).astype(np.uint8))
    monkeypatch.setenv("GMMVI_DATASETS", str(tmp_path))
    monkeypatch.delenv("GMMVI_ALLOW_SYNTHETIC", raising=False)
    x_tr, y_tr, x_te, y_te = data_lib.load_mnist()
    assert x_tr.shape == (32, 784) and x_te.shape == (8, 784)
    assert x_tr.dtype == np.float32
    assert 0.0 <= x_tr.min() and x_tr.max() <= 1.0
    assert y_tr.shape == (32,)
