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


@pytest.mark.slow
def test_two_process_distributed_estimator_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    })
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
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


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
