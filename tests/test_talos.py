"""Talos IK target: URDF kinematics + density + end-to-end optimization.

The reference's Talos target (talos_ik.py:16-188) relies on an external
tf_robot_learning fork, so there is no importable oracle; these tests verify
the from-scratch JAX implementation against physical invariants of the
bundled URDF and against autodiff/jit contracts instead.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gmmvi_tpu.experiments.targets.talos_ik import Talos, make_talos_target
from gmmvi_tpu.experiments.targets.urdf import rpy_matrix_batched


@pytest.fixture(scope="module")
def talos():
    return make_talos_target([0.1, 0.5, 1.0])


def test_tree_structure(talos):
    # 28 actuated joints + 6-DoF floating base = 34 dims (talos_ik.py:42)
    assert talos.get_num_dimensions() == 34
    assert talos.tree.nb_joint == 28
    assert set(talos.tree.tip_nodes) == {
        "r_gripper", "l_gripper", "r_foot", "l_foot"
    }
    # all limits are proper intervals
    lim = talos.tree.joint_limits
    assert np.all(lim[:, 0] < lim[:, 1])
    # the full robot has meaningful mass
    assert 50.0 < talos.tree._total_mass < 150.0


def test_fk_neutral_pose_symmetry(talos):
    """At the neutral pose the robot is left/right symmetric: feet and
    grippers mirror in y, CoM is on the sagittal plane."""
    x0 = jnp.asarray(talos.mean_joints)[None]
    q = x0[:, :28]
    P, R = talos.tree.fk(q, x0[:, 28:31], rpy_matrix_batched(x0[:, -3:]))
    lf = np.asarray(talos.tree.tip_pose(P, R, "l_foot")[0, :3])
    rf = np.asarray(talos.tree.tip_pose(P, R, "r_foot")[0, :3])
    lg = np.asarray(talos.tree.tip_pose(P, R, "l_gripper")[0, :3])
    rg = np.asarray(talos.tree.tip_pose(P, R, "r_gripper")[0, :3])
    np.testing.assert_allclose(lf[[0, 2]], rf[[0, 2]], atol=1e-5)
    np.testing.assert_allclose(lf[1], -rf[1], atol=1e-5)
    np.testing.assert_allclose(lg[[0, 2]], rg[[0, 2]], atol=1e-4)
    np.testing.assert_allclose(lg[1], -rg[1], atol=1e-4)
    com = np.asarray(talos.tree.com(P, R)[0])
    assert abs(com[1]) < 0.01
    # feet stand below the base, near the reference's foot y targets +-0.09
    assert lf[2] < 0.3 and abs(lf[1] - 0.09) < 0.02


def test_fk_base_transform_equivariance(talos):
    """Translating / yawing the floating base rigidly transforms every tip."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 28)).astype(np.float32))
    base0 = jnp.zeros((4, 3))
    rot0 = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    P0, R0 = talos.tree.fk(q, base0, rot0)

    shift = jnp.asarray([0.3, -0.2, 0.5])
    P1, R1 = talos.tree.fk(q, base0 + shift, rot0)
    for name in ("l_gripper", "r_foot"):
        a = talos.tree.tip_pose(P0, R0, name)
        b = talos.tree.tip_pose(P1, R1, name)
        np.testing.assert_allclose(
            np.asarray(b[:, :3]), np.asarray(a[:, :3] + shift), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b[:, 3:]), np.asarray(a[:, 3:]), atol=1e-6
        )

    yaw = jnp.asarray(np.tile([0.0, 0.0, 0.7], (4, 1)).astype(np.float32))
    rot_yaw = rpy_matrix_batched(yaw)
    P2, R2 = talos.tree.fk(q, base0, rot_yaw)
    a = np.asarray(talos.tree.tip_pose(P0, R0, "l_gripper")[:, :3])
    b = np.asarray(talos.tree.tip_pose(P2, R2, "l_gripper")[:, :3])
    expected = np.einsum("ij,bj->bi", np.asarray(rot_yaw[0]), a)
    np.testing.assert_allclose(b, expected, atol=1e-5)


def test_joint_limit_prior_shape(talos):
    """The soft-uniform joint prior is ~flat inside the limits and falls off
    sharply outside (SoftUniformNormalCdf semantics, talos_ik.py:97-111)."""
    lim = talos.tree.joint_limits
    mid = jnp.asarray(lim.mean(axis=1))[None]
    inside = Talos._soft_uniform_log_prob(
        mid, jnp.asarray(lim[:, 0]), jnp.asarray(lim[:, 1]), 0.05
    )
    beyond = Talos._soft_uniform_log_prob(
        jnp.asarray(lim[:, 1])[None] + 0.5,
        jnp.asarray(lim[:, 0]), jnp.asarray(lim[:, 1]), 0.05,
    )
    assert float(inside[0]) > -1e-3
    assert float(beyond[0]) < -100.0


def test_density_grad_and_jit(talos):
    key = jax.random.PRNGKey(1)
    xs = jnp.asarray(talos.mean_joints) + 0.05 * jax.random.normal(
        key, (8, 34))
    ld, g = talos.log_density_and_grad(xs)
    assert ld.shape == (8,) and g.shape == (8, 34)
    assert bool(jnp.all(jnp.isfinite(ld))) and bool(jnp.all(jnp.isfinite(g)))
    # jit-safe: the reference cannot do this (safe_for_tf_graph=False)
    assert talos.safe_for_jit
    jld = jax.jit(talos.log_density)(xs)
    np.testing.assert_allclose(np.asarray(jld), np.asarray(ld), rtol=1e-5,
                               atol=1e-4)
    # a configuration satisfying the experts scores far above a random one
    far = jax.random.normal(jax.random.PRNGKey(2), (8, 34))
    assert float(jnp.max(ld)) > float(jnp.max(talos.log_density(far)))


def test_talos_end_to_end_improves():
    """A short SAMTRON run on the Talos posterior improves the ELBO by orders
    of magnitude (the reference experiment talos.yml, scaled down)."""
    import gmmvi_tpu.configs as configs
    from gmmvi_tpu import GmmviRunner

    cfg = configs.get_default_config("SAMTRON", "talos")
    cfg = configs.update_config(cfg, {
        "sample_selector_config": {"desired_samples_per_component": 48},
        "gmmvi_runner_config": {"log_metrics_interval": 1000},
        "tpu": {"max_components": 2},
        "num_component_adapter_config": {"del_iters": 100, "add_iters": 100},
    })
    r = GmmviRunner.build_from_config(cfg)
    for n in range(31):
        r.iterate_and_log(n)
    samples, entropy = r._samples_and_entropy(
        r.gmmvi.state.model, 512, jax.random.PRNGKey(7))
    reward = float(jnp.mean(r.target_distribution.log_density(samples)))
    elbo = reward + float(entropy)
    # starts around -1.1e4 (prior); must improve by better than 4x within
    # the tiny 31-iteration budget (a full-size run reaches positive ELBO,
    # see examples/8_talos_ik.py)
    assert np.isfinite(elbo) and elbo > -2500.0


def test_gripper_target_prior_sampler():
    from gmmvi_tpu.experiments.targets.talos_ik import (
        TalosLeftGripperTargetPdf,
    )

    s = TalosLeftGripperTargetPdf().sample(jax.random.PRNGKey(0), 256)
    assert s.shape == (256, 3)
    radii = np.linalg.norm(np.asarray(s), axis=-1)
    assert np.all(radii >= 0.2 - 1e-5) and np.all(radii <= 1.0 + 1e-5)
