"""Multi-process (DCN-path) smoke test: 2 CPU processes, one global mesh.

Exercises ``parallel.mesh.initialize_distributed`` — the one seam that
virtual single-process meshes cannot reach (SURVEY.md §4: multi-host
behavior must be testable without a pod).  Two subprocesses each hold 4
virtual CPU devices, join one jax.distributed coordination service, build
the global 8-device ``data`` mesh, run the sharded Stein estimator on a
deterministic batch, and assert the psum-reduced moments match the
single-process (unmeshed) computation bit-for-bit within float tolerance.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1]); num_procs = int(sys.argv[2]); port = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")

from gmmvi_tpu.parallel.mesh import initialize_distributed

initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=num_procs, process_id=proc_id)
assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # 4 local x 2 processes

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.optimization.ng_estimators import stein_estimate

rng = np.random.RandomState(0)
k, d, n = 3, 4, 800
w = np.ones(k, np.float32) / k
mu = rng.randn(k, d).astype(np.float32)
a = rng.randn(k, d, d).astype(np.float32)
covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
state = G.create_gmm_state(w, mu, covs, max_components=k + 1)
samples = rng.randn(n, d).astype(np.float32)
lnpdfs = rng.randn(n).astype(np.float32)
grads = rng.randn(n, d).astype(np.float32)
bg = np.asarray(G.log_density(state, jnp.asarray(samples)))

mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
sh = NamedSharding(mesh, P("data", None))
sh1 = NamedSharding(mesh, P("data"))
rep = NamedSharding(mesh, P())

def put(x, s):
    return jax.make_array_from_process_local_data(s, np.asarray(x))

est = jax.jit(stein_estimate, static_argnames=(
    "use_self_normalized_importance_weights", "only_use_own_samples"),
    out_shardings=rep)(
    jax.device_put(state, rep),
    put(samples, sh), put(np.ones(n, bool), sh1),
    put(np.zeros(n, np.int32), sh1), put(bg, sh1), put(lnpdfs, sh1),
    put(grads, sh),
    use_self_normalized_importance_weights=True,
)
# outputs are replicated: any addressable shard holds the full value
h = np.asarray(est.expected_hessians_neg.addressable_data(0))
g = np.asarray(est.expected_gradients_neg.addressable_data(0))

# single-process oracle computed locally on this process
est_local = stein_estimate(
    state, jnp.asarray(samples), jnp.ones(n, bool),
    jnp.zeros(n, jnp.int32), jnp.asarray(bg), jnp.asarray(lnpdfs),
    jnp.asarray(grads), use_self_normalized_importance_weights=True)
np.testing.assert_allclose(h, np.asarray(est_local.expected_hessians_neg),
                           rtol=1e-4, atol=1e-5)
np.testing.assert_allclose(g, np.asarray(est_local.expected_gradients_neg),
                           rtol=1e-4, atol=1e-5)
print(f"proc {proc_id}: OK")
"""


_FULL_STEP_WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1]); num_procs = int(sys.argv[2]); port = sys.argv[3]
db_layout = sys.argv[4]; oracle_path = sys.argv[5]

import jax
jax.config.update("jax_platforms", "cpu")

# proc_id -1: ORACLE mode — the identical sharded program on a
# single-process virtual 8-device mesh (launched with
# xla_force_host_platform_device_count=8, no jax.distributed); its
# trajectory is the reference the 2-process run must reproduce.
oracle_mode = proc_id < 0
if not oracle_mode:
    from gmmvi_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=num_procs, process_id=proc_id)
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from gmmvi_tpu.configs import get_default_algorithm_config, update_config
from gmmvi_tpu.experiments.setup import init_experiment
from gmmvi_tpu.experiments.targets.gmm import make_simple_target
from gmmvi_tpu.optimization.gmmvi import GMMVI


def build(mesh):
    target = make_simple_target()
    cfg = get_default_algorithm_config("SAMTRON")
    cfg = update_config(cfg, {
        "start_seed": 3, "seed": 3, "target_fn": target,
        "environment_name": "test",
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
        "tpu": {"max_components": 8,
                **({"db_layout": db_layout} if mesh is not None else {})},
    })
    t, model, meta = init_experiment(cfg)
    return GMMVI.build_from_config(cfg, t, model, meta, mesh=mesh)


mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
rep = NamedSharding(mesh, P())

# ---- the FULL training step (selector window gathers, DB ring writes,
# estimator psums, trust-region bisection, weight bracket, VIPS adaptation
# conds) over the 8-device mesh: single-process in oracle mode, across
# 2 real jax.distributed processes otherwise --------------------------------
g = build(mesh)
state = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
    g.state)
step = jax.jit(g._spmd_scoped(g._full_step), donate_argnums=0,
               out_shardings=rep)

def rd(x):
    return np.asarray(x.addressable_data(0))

fevals, snap = [], None
for it in range(10):
    state = step(state)
    fevals.append(int(rd(state.db.num_samples_written)))
    if it == 2:
        snap = (rd(state.model.means), rd(state.model.log_weights))

means_fin = rd(state.model.means)
n_act = int(rd(state.model.num_active))

if oracle_mode:
    np.savez(oracle_path, fevals=np.asarray(fevals), means3=snap[0],
             logw3=snap[1], n_act=n_act)
    print("oracle: OK")
else:
    ref = np.load(oracle_path)
    # exact feval accounting across the whole run (the sample-selection
    # semantics, reference sample_db.py:113)
    assert fevals == list(ref["fevals"]), (fevals, ref["fevals"])
    # trajectory coincidence while summation-order noise is still small
    np.testing.assert_allclose(snap[0], ref["means3"], rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(snap[1], ref["logw3"], rtol=5e-4, atol=5e-4)
    # state stays sound at iteration 10
    assert n_act == int(ref["n_act"])
    assert np.all(np.isfinite(means_fin[:n_act]))
    print(f"proc {proc_id}: OK")
"""


def _worker_env(devices_per_proc: int) -> dict:
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS":
            f"--xla_force_host_platform_device_count={devices_per_proc}",
        "PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    })
    return env


def _run_two_procs(tmp_path, worker_src, extra_args=()):
    port = _free_port()
    env = _worker_env(4)
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port),
             *extra_args],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
        assert f"proc {i}: OK" in out


@pytest.mark.slow
def test_two_process_distributed_estimator_matches_single_process(tmp_path):
    _run_two_procs(tmp_path, _WORKER)


@pytest.mark.slow
@pytest.mark.parametrize("db_layout", ["global", "sharded"])
def test_two_process_full_training_trajectory(tmp_path, db_layout):
    """The COMPLETE training step under real jax.distributed: 10 train
    iterations across 2 processes (DB ring writes, window gathers, VIPS
    adaptation conds, weight bracket — everything the estimator-only smoke
    test does not reach), for both the global ring and the sharded
    per-device DB layout.  The oracle is the IDENTICAL program on a
    single-process virtual 8-device mesh: exact feval parity over all 10
    iterations, trajectory coincidence at iteration 3."""
    script = tmp_path / "worker.py"
    script.write_text(_FULL_STEP_WORKER)
    oracle = tmp_path / "oracle.npz"
    out = subprocess.run(
        [sys.executable, str(script), "-1", "1", "0", db_layout, str(oracle)],
        env=_worker_env(8), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=600,
    )
    assert out.returncode == 0 and "oracle: OK" in out.stdout, \
        out.stdout[-4000:]
    _run_two_procs(tmp_path, _FULL_STEP_WORKER,
                   extra_args=(db_layout, str(oracle)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
