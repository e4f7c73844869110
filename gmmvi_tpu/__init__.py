"""gmmvi_tpu — a TPU-native framework for GMM-based variational inference.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
framework *gmmvi* (Arenz et al., 2023): natural-gradient variational inference
with Gaussian mixture models, maximizing E_q[log p(x)] + beta * H(q) over a GMM
q(x) = sum_o q(o) q(x|o) via independent natural-gradient steps on the
categorical weights and each Gaussian component
(reference: src/gmmvi/optimization/gmmvi.py:16-174).

Design differences from the reference (TensorFlow, dynamic shapes, per-component
Python loops) — everything here is built TPU-first:

* **Static padded state**: the mixture lives in fixed-capacity arrays
  ``[Kmax, ...]`` with an active-prefix count; add/delete are slot writes and
  compaction gathers, so the whole training step is one compiled XLA program.
* **Everything batched over components**: component log-densities, natural
  gradient estimation, trust-region updates and stepsize adaptation are
  ``vmap``-ed pure functions; Mahalanobis terms are computed with cached inverse
  Cholesky factors so the hot path is batched matmuls on the MXU rather than
  triangular solves.
* **Ring-buffer sample database** with a bounded distribution-snapshot ring and
  a reservoir of candidate locations, replacing the reference's unbounded
  dynamically-shaped variables (reference: src/gmmvi/optimization/sample_db.py).
* **SPMD data parallelism**: per-iteration sample batches are sharded over a
  ``jax.sharding.Mesh`` data axis; per-component sufficient statistics reduce
  over ICI via XLA collectives.
"""

__version__ = "0.1.0"

from gmmvi_tpu import configs
from gmmvi_tpu.experiments.setup import construct_initial_mixture, init_experiment
from gmmvi_tpu.experiments.targets.lnpdf import LNPDF
from gmmvi_tpu.models.gmm import GmmState, create_gmm_state
from gmmvi_tpu.models.meta import MetaState
from gmmvi_tpu.optimization.gmmvi import GMMVI, TrainState
from gmmvi_tpu.runner import GmmviRunner

__all__ = [
    "configs",
    "construct_initial_mixture",
    "init_experiment",
    "LNPDF",
    "GmmState",
    "MetaState",
    "create_gmm_state",
    "GMMVI",
    "TrainState",
    "GmmviRunner",
    "__version__",
]
