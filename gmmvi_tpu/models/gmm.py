"""Statically-shaped Gaussian mixture model state and batched mixture ops.

This is the TPU-native replacement for the reference's dynamically-shaped
``GMM`` / ``FullCovGMM`` / ``DiagonalGMM`` classes
(reference: src/gmmvi/models/gmm.py, full_cov_gmm.py, diagonal_gmm.py).

Key design points (deliberately different from the reference):

* The mixture is stored in **fixed-capacity padded arrays** ``[Kmax, ...]``
  with the invariant that the active components occupy the prefix
  ``[0, num_active)``.  Adding a component writes into slot ``num_active``;
  deleting compacts via a gather.  Nothing ever changes array shapes, so every
  consumer stays inside a single compiled XLA program.
* Inactive slots carry ``log_weight = -inf`` and **identity Cholesky factors**
  so that batched linear algebra over the full padded axis stays finite.
* We cache the **inverse Cholesky factors**.  Mahalanobis terms are then
  batched matmuls (``einsum``) that map onto the TPU MXU, instead of the
  reference's ``tf.linalg.triangular_solve``
  (reference: full_cov_gmm.py:56-62).  Inverses are recomputed once per
  component update (K * D^3) and amortized over every density query.
* ``log_density_and_grad`` is computed **analytically** from the same
  intermediates (no autodiff pass):  grad = -sum_k r_k(x) Sigma_k^{-1}(x-mu_k)
  with responsibilities r_k.  This fuses the reference's GradientTape pass
  (reference: gmm.py:274-300) with the density computation, and the
  ``Sigma^{-1}(x-mu)`` intermediate is shared with the Stein estimator.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple
import contextlib

import jax
import jax.numpy as jnp
from flax import struct

from gmmvi_tpu.ops.stable import masked_logsumexp, NEG_INF

LOG_2PI = math.log(2.0 * math.pi)

# True while GMMVI traces a step with a data-parallel mesh configured.  The
# fused Pallas kernels are opaque custom calls to XLA's SPMD partitioner, so
# under a mesh they are wrapped in shard_map over the mesh's data axis
# (replicated model params, sample-sharded batch; see shard_map_data) —
# SPMD_MESH carries the mesh to the kernel call sites.  When the batch is
# not evenly shardable the SPMD trace falls back to the partitionable XLA
# path.  Scoped via spmd_scope (not set-once) so meshed and unmeshed GMMVI
# instances in the same process each trace with the right kernel gating.
SPMD_ACTIVE = False
SPMD_MESH = None


@contextlib.contextmanager
def spmd_scope(mesh):
    """Scope the SPMD kernel gate (and mesh) for the duration of a trace.

    ``mesh`` is the :class:`jax.sharding.Mesh` of the step being traced, or
    None for unmeshed traces."""
    global SPMD_ACTIVE, SPMD_MESH
    prev, prev_mesh = SPMD_ACTIVE, SPMD_MESH
    SPMD_ACTIVE = mesh is not None
    SPMD_MESH = mesh
    try:
        yield
    finally:
        SPMD_ACTIVE = prev
        SPMD_MESH = prev_mesh


def spmd_data_mesh(n: int):
    """The scoped SPMD mesh if the fused kernels can run shard-mapped over
    its ``data`` axis for a batch of ``n`` samples (even shardability), else
    None.  Unmeshed traces also return None — kernels then run unwrapped."""
    if not SPMD_ACTIVE or SPMD_MESH is None:
        return None
    if "data" not in SPMD_MESH.axis_names:
        return None
    if n % SPMD_MESH.shape["data"] != 0:
        return None
    return SPMD_MESH


def shard_map_data(fn, mesh, n_sharded_inputs: int, out_specs):
    """shard_map ``fn`` over the mesh's ``data`` axis: the LAST
    ``n_sharded_inputs`` positional argument(s) shard their leading axis over
    ``data``; everything before is replicated (model / distribution
    parameters).  Axes the specs don't mention (e.g. ``comp`` on hybrid
    meshes) stay replicated — the kernels compute identically along them.
    """
    from jax import shard_map

    P = jax.sharding.PartitionSpec

    def wrapped(*args):
        n_rep = len(args) - n_sharded_inputs
        in_specs = tuple(P() for _ in range(n_rep)) + tuple(
            P("data") for _ in range(n_sharded_inputs))
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(*args)

    return wrapped

# Mahalanobis / density einsums need f32-true accumulation on the MXU.
_PREC = jax.lax.Precision.HIGHEST


@struct.dataclass
class GmmState:
    """Padded GMM parameters.

    Attributes:
        log_weights: ``[Kmax]`` log mixture weights; ``-inf`` for inactive slots.
        means: ``[Kmax, D]`` component means (zeros for inactive slots).
        chols: ``[Kmax, D, D]`` lower-triangular Cholesky factors of the
            covariances, or ``[Kmax, D]`` sqrt-variances when ``diagonal``.
            Identity / ones for inactive slots.
        inv_chols: cached inverses of ``chols`` (same shape).
        num_active: scalar int32, number of active components ``K``.
        diagonal: static flag selecting the diagonal-covariance family.
    """

    log_weights: jnp.ndarray
    means: jnp.ndarray
    chols: jnp.ndarray
    inv_chols: jnp.ndarray
    num_active: jnp.ndarray
    diagonal: bool = struct.field(pytree_node=False, default=False)

    @property
    def max_components(self) -> int:
        return self.log_weights.shape[0]

    @property
    def num_dimensions(self) -> int:
        return self.means.shape[1]

    @property
    def mask(self) -> jnp.ndarray:
        """``[Kmax]`` boolean mask of active slots (prefix invariant)."""
        return jnp.arange(self.max_components) < self.num_active

    @property
    def weights(self) -> jnp.ndarray:
        return jnp.where(self.mask, jnp.exp(self.log_weights), 0.0)

    @property
    def covs(self) -> jnp.ndarray:
        if self.diagonal:
            return jnp.square(self.chols)
        return jnp.einsum("kij,klj->kil", self.chols, self.chols, precision=_PREC)


def invert_chol(chols: jnp.ndarray, diagonal: bool) -> jnp.ndarray:
    """Inverse of (batched) lower-triangular Cholesky factors."""
    if diagonal:
        return 1.0 / chols
    eye = jnp.eye(chols.shape[-1], dtype=chols.dtype)
    return jax.vmap(
        lambda c: jax.scipy.linalg.solve_triangular(c, eye, lower=True)
    )(chols)


def safe_chol_pad(chols: jnp.ndarray, mask: jnp.ndarray, diagonal: bool) -> jnp.ndarray:
    """Overwrite inactive slots with identity factors to keep linalg finite."""
    if diagonal:
        return jnp.where(mask[:, None], chols, 1.0)
    eye = jnp.eye(chols.shape[-1], dtype=chols.dtype)
    return jnp.where(mask[:, None, None], chols, eye)


def create_gmm_state(
    weights: jnp.ndarray,
    means: jnp.ndarray,
    covs: jnp.ndarray,
    max_components: Optional[int] = None,
    diagonal: bool = False,
    dtype=jnp.float32,
) -> GmmState:
    """Build a padded :class:`GmmState` from K initial components.

    ``covs`` is ``[K, D, D]`` (full) or ``[K, D]`` (diagonal variances).
    Mirrors the constructors at reference full_cov_gmm.py:19-27 and
    diagonal_gmm.py:20-28 (weights auto-normalized, covs choleskied).
    """
    weights = jnp.asarray(weights, dtype)
    means = jnp.asarray(means, dtype)
    covs = jnp.asarray(covs, dtype)
    k, d = means.shape
    kmax = max_components if max_components is not None else k
    if kmax < k:
        raise ValueError(f"max_components={kmax} < initial components {k}")

    log_w = jnp.log(weights)
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    if diagonal:
        chols = jnp.sqrt(covs)
        pad_chol = jnp.ones((kmax - k, d), dtype)
    else:
        chols = jax.vmap(jnp.linalg.cholesky)(covs)
        pad_chol = jnp.tile(jnp.eye(d, dtype=dtype)[None], (kmax - k, 1, 1))

    log_weights = jnp.concatenate([log_w, jnp.full((kmax - k,), NEG_INF, dtype)])
    means_p = jnp.concatenate([means, jnp.zeros((kmax - k, d), dtype)])
    chols_p = jnp.concatenate([chols, pad_chol])
    return GmmState(
        log_weights=log_weights,
        means=means_p,
        chols=chols_p,
        inv_chols=invert_chol(chols_p, diagonal),
        num_active=jnp.asarray(k, jnp.int32),
        diagonal=diagonal,
    )


# ---------------------------------------------------------------------------
# Densities
# ---------------------------------------------------------------------------

def chol_log_det(chols: jnp.ndarray, diagonal: bool) -> jnp.ndarray:
    """log |L| per component: sum of log diagonal entries."""
    if diagonal:
        return jnp.sum(jnp.log(chols), axis=-1)
    return jnp.sum(jnp.log(jnp.diagonal(chols, axis1=-2, axis2=-1)), axis=-1)


def whitened_diffs(
    state: GmmState, samples: jnp.ndarray, shard_fn=None
) -> jnp.ndarray:
    """``y[k, n] = L_k^{-1} (x_n - mu_k)``, shape ``[Kmax, N, D]``.

    The single hot intermediate: batched matmul on the MXU (reference computes
    this with triangular solves at full_cov_gmm.py:56-62).  ``shard_fn`` pins
    the ``[Kmax, N, D]`` intermediates to the mesh's sample axis (see
    :func:`density_pack`).
    """
    diffs = samples[None, :, :] - state.means[:, None, :]
    if shard_fn is not None:
        diffs = shard_fn(diffs, axis=1)
    if state.diagonal:
        y = state.inv_chols[:, None, :] * diffs
    else:
        y = jnp.einsum("kij,knj->kni", state.inv_chols, diffs,
                       precision=_PREC)
    if shard_fn is not None:
        y = shard_fn(y, axis=1)
    return y


def component_log_densities_from_whitened(
    state: GmmState, y: jnp.ndarray
) -> jnp.ndarray:
    """``[Kmax, N]`` per-component Gaussian log densities given whitened diffs."""
    d = state.num_dimensions
    maha = -0.5 * jnp.sum(jnp.square(y), axis=-1)
    const = -chol_log_det(state.chols, state.diagonal) - 0.5 * d * LOG_2PI
    return maha + const[:, None]


def component_log_densities(
    state: GmmState, samples: jnp.ndarray, shard_fn=None
) -> jnp.ndarray:
    """``[Kmax, N]`` log N(x_n; mu_k, Sigma_k). Inactive slots give garbage —
    always combine with ``state.mask``. (reference: full_cov_gmm.py:56-62)"""
    return component_log_densities_from_whitened(
        state, whitened_diffs(state, samples, shard_fn=shard_fn))


def _fused_density_dispatch(state: GmmState, samples: jnp.ndarray, mode: str,
                            want: str):
    """Invoke the fused density kernels, shard_map-wrapped over the scoped
    SPMD mesh's data axis when one is active (model parameters replicated,
    samples / per-sample outputs sharded — the kernels are per-sample maps,
    so no collectives are introduced).  ``want``: 'pack' | 'densities'."""
    import functools as _ft

    from gmmvi_tpu.ops import pallas_density as _pd
    from gmmvi_tpu.ops import pallas_density_large as _pdl

    P = jax.sharding.PartitionSpec
    logdets = jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(state.chols, axis1=-2, axis2=-1))),
        axis=-1,
    )
    logw = jnp.where(state.mask, state.log_weights, NEG_INF)
    interpret = mode == "interpret"
    # the VMEM-resident kernel when it fits; else the K-tiled stream
    small = _pd.supports(state.num_dimensions, state.max_components)
    if want == "pack":
        impl = _pd.fused_density_pack if small else \
            _pdl.fused_density_pack_large
        fn = _ft.partial(impl, interpret=interpret)
        out_specs = (P(None, "data"), P("data"), P("data"))
    else:
        impl = _pd.fused_component_densities if small else \
            _pdl.fused_component_densities_large
        fn = _ft.partial(impl, interpret=interpret)
        out_specs = (P(None, "data"), P("data"))
    mesh = spmd_data_mesh(samples.shape[0])
    if mesh is not None:
        fn = shard_map_data(fn, mesh, 1, out_specs)
    return fn(state.means, state.inv_chols, logw, logdets, samples)


def component_log_densities_fast(
    state: GmmState, samples: jnp.ndarray, shard_fn=None
) -> jnp.ndarray:
    """Like :func:`component_log_densities`, but routed through the fused
    Pallas kernel on TPU (one streamed pass, no ``[Kmax, N, D]`` HBM
    intermediates).  Values match the XLA path up to float rounding."""
    mode = _fused_density_mode(state, samples.shape[0])
    if mode != "off":
        comp, _ = _fused_density_dispatch(state, samples, mode, "densities")
        return comp
    return component_log_densities(state, samples, shard_fn=shard_fn)


def log_density(state: GmmState, samples: jnp.ndarray) -> jnp.ndarray:
    """``[N]`` mixture log density (reference: gmm.py:203-216)."""
    comp = component_log_densities(state, samples)
    return masked_logsumexp(
        comp + state.log_weights[:, None], mask=state.mask[:, None], axis=0
    )


def log_densities_also_individual(
    state: GmmState, samples: jnp.ndarray, shard_fn=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(model log densities [N], component log densities [Kmax, N]).
    (reference: gmm.py:183-201)  ``shard_fn`` pins the pass to the mesh's
    sample axis (see :func:`density_pack`)."""
    mode = _fused_density_mode(state, samples.shape[0])
    if mode != "off":
        comp, model = _fused_density_dispatch(state, samples, mode,
                                              "densities")
        return model, comp
    comp = component_log_densities(state, samples, shard_fn=shard_fn)
    model = masked_logsumexp(
        comp + state.log_weights[:, None], mask=state.mask[:, None], axis=0
    )
    return model, comp


@struct.dataclass
class DensityPack:
    """All density-related intermediates from one fused pass over samples.

    ``prec_times_diff`` is ``None`` when the pack was produced by the Pallas
    fused kernel — consumers (the Stein estimator) then use the moment form,
    which never needs the ``[Kmax, N, D]`` array."""

    component_log_densities: jnp.ndarray  # [Kmax, N]
    model_log_densities: jnp.ndarray      # [N]
    model_grads: jnp.ndarray              # [N, D]
    prec_times_diff: jnp.ndarray          # [Kmax, N, D] = Sigma_k^{-1}(x - mu_k)


def _fused_density_mode(state: GmmState, n: int) -> str:
    """'pallas' | 'interpret' | 'off' — whether density_pack should use the
    fused TPU kernel (gmmvi_tpu/ops/pallas_density.py).

    auto: full-covariance models within the kernel's (D, K_pad) envelope on
    a TPU backend and a window large enough to tile.  GMMVI_FUSED_DENSITY=0
    disables, =1 forces, =interpret runs the kernel in interpreter mode
    (for tests on CPU).
    """
    import os

    from gmmvi_tpu.ops import pallas_density, pallas_density_large

    mode = os.environ.get("GMMVI_FUSED_DENSITY", "auto")
    if mode == "0":
        return "off"
    if state.diagonal or not (
        pallas_density.supports(state.num_dimensions, state.max_components)
        or pallas_density_large.supports(state.num_dimensions)
    ):
        return "off"
    if SPMD_ACTIVE and spmd_data_mesh(n) is None \
            and mode not in ("1", "interpret"):
        # meshed trace but the batch is not evenly shardable: the kernel
        # cannot be shard_map-wrapped, and unwrapped it is an opaque custom
        # call that would force all-gathers — fall back to the XLA path
        return "off"
    if mode == "interpret":
        return "interpret"
    if n < 512 and mode != "1":
        return "off"
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    if mode == "1" or on_tpu:
        return "pallas"
    return "off"


def density_pack(
    state: GmmState, samples: jnp.ndarray, shard_fn=None
) -> DensityPack:
    """One fused pass computing densities, analytic mixture grads, and the
    Stein intermediate ``Sigma^{-1}(x-mu)``.

    grad_x log q(x) = - sum_k r_k(x) Sigma_k^{-1}(x-mu_k) with responsibilities
    r_k(x) = softmax_k(log w_k + log N_k(x)).  Replaces the reference's
    GradientTape pass (gmm.py:274-300) with shared MXU matmuls; on TPU the
    whole pass runs as one Pallas kernel (see
    :mod:`gmmvi_tpu.ops.pallas_density`).

    ``shard_fn`` (data-parallel runs) pins the ``[Kmax, N, D]`` intermediates
    to the mesh's sample axis.  Pinning only the pack's *outputs* is not
    enough: XLA's SPMD partitioner then elects to compute the diff/whitening
    chain K-sharded — all-gathering the sample batch onto every device and
    all-to-all'ing the result back to the requested N-sharding (measured by
    scripts/analyze_collectives.py: 2x 768 KB all-gather + 4.6 MB all-to-all
    per step at the flagship shape).  Pinning the intermediates keeps the
    whole chain local: samples stay sharded, means/chols replicated.
    """
    mode = _fused_density_mode(state, samples.shape[0])
    if mode != "off":
        comp, model, grads = _fused_density_dispatch(state, samples, mode,
                                                     "pack")
        return DensityPack(
            component_log_densities=comp,
            model_log_densities=model,
            model_grads=grads,
            prec_times_diff=None,
        )
    y = whitened_diffs(state, samples, shard_fn=shard_fn)
    comp = component_log_densities_from_whitened(state, y)
    mask = state.mask
    weighted = comp + state.log_weights[:, None]
    model = masked_logsumexp(weighted, mask=mask[:, None], axis=0)
    # responsibilities [Kmax, N]
    resp = jnp.where(mask[:, None], jnp.exp(weighted - model[None, :]), 0.0)
    if state.diagonal:
        ptd = state.inv_chols[:, None, :] * y  # [Kmax, N, D]
    else:
        ptd = jnp.einsum("kji,knj->kni", state.inv_chols, y, precision=_PREC)
    if shard_fn is not None:
        ptd = shard_fn(ptd, axis=1)
    grads = -jnp.einsum("kn,knd->nd", resp, ptd, precision=_PREC)
    return DensityPack(
        component_log_densities=comp,
        model_log_densities=model,
        model_grads=grads,
        prec_times_diff=ptd,
    )


def log_density_and_grad(
    state: GmmState, samples: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(model log densities, model grads, component log densities).
    (reference: gmm.py:274-300)"""
    pack = density_pack(state, samples)
    return pack.model_log_densities, pack.model_grads, pack.component_log_densities


def density(state: GmmState, samples: jnp.ndarray) -> jnp.ndarray:
    """exp of the mixture log density (reference: gmm.py:236-247)."""
    return jnp.exp(log_density(state, samples))


def component_log_density_and_grad(
    state: GmmState, index, samples: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Log density and gradient of one component at the given samples
    (reference: gmm.py:302-321).  grad = -Sigma_i^{-1}(x - mu_i), analytic."""
    mu = state.means[index]
    diffs = samples - mu[None, :]
    if state.diagonal:
        inv = state.inv_chols[index]
        y = inv[None, :] * diffs
        ptd = inv[None, :] * y
        log_det = jnp.sum(jnp.log(state.chols[index]))
    else:
        inv = state.inv_chols[index]
        y = jnp.einsum("ij,nj->ni", inv, diffs, precision=_PREC)
        ptd = jnp.einsum("ji,nj->ni", inv, y, precision=_PREC)
        log_det = jnp.sum(jnp.log(jnp.diag(state.chols[index])))
    d = state.num_dimensions
    ld = -0.5 * jnp.sum(jnp.square(y), axis=-1) - log_det - 0.5 * d * LOG_2PI
    return ld, -ptd


def marginal_log_density(state: GmmState, samples: jnp.ndarray, dim) -> jnp.ndarray:
    """1-D marginal mixture log density along ``dim``
    (reference: gmm.py:218-234, full_cov_gmm.py:49-54)."""
    x = samples[:, dim]
    mu = state.means[:, dim]
    if state.diagonal:
        var = jnp.square(state.chols[:, dim])
    else:
        var = jnp.sum(jnp.square(state.chols[:, dim, :]), axis=-1)
    comp = (
        -0.5 * jnp.square(x[None, :] - mu[:, None]) / var[:, None]
        - 0.5 * jnp.log(var)[:, None]
        - 0.5 * LOG_2PI
    )
    return masked_logsumexp(
        comp + state.log_weights[:, None], mask=state.mask[:, None], axis=0
    )


# ---------------------------------------------------------------------------
# Entropies
# ---------------------------------------------------------------------------

def component_entropies(state: GmmState) -> jnp.ndarray:
    """``[Kmax]`` Gaussian entropies 0.5 D (log 2pi + 1) + log|L|
    (reference: full_cov_gmm.py:33-34)."""
    d = state.num_dimensions
    return 0.5 * d * (LOG_2PI + 1.0) + chol_log_det(state.chols, state.diagonal)


def average_entropy(state: GmmState) -> jnp.ndarray:
    """Weight-averaged component entropy (reference: gmm.py:262-272)."""
    return jnp.sum(state.weights * jnp.where(state.mask, component_entropies(state), 0.0))


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def sample_categorical(state: GmmState, key, num_samples: int) -> jnp.ndarray:
    """Draw component indices according to the active weights
    (reference: gmm.py:124-137, via cumsum-argmax; here jax.random.categorical)."""
    logits = jnp.where(state.mask, state.log_weights, NEG_INF)
    return jax.random.categorical(key, logits, shape=(num_samples,))


def sample_from_components(
    state: GmmState, key, samples_per_component: int
) -> jnp.ndarray:
    """Draw ``[Kmax, n, D]`` samples, n per (padded) component: mu + L eps.

    The caller masks out draws from inactive slots / beyond per-component
    counts.  Static-shape analogue of reference gmm.py:361-386.
    """
    kmax, d = state.means.shape[0], state.num_dimensions
    eps = jax.random.normal(key, (kmax, samples_per_component, d), state.means.dtype)
    if state.diagonal:
        return state.means[:, None, :] + state.chols[:, None, :] * eps
    return state.means[:, None, :] + jnp.einsum(
        "kij,knj->kni", state.chols, eps, precision=_PREC
    )


def sample_from_components_shuffled(
    state: GmmState, key, samples_per_component: int
) -> jnp.ndarray:
    """Fixed per-component draws, flattened and shuffled
    (reference: gmm.py:340-359).  Only active components contribute; returns
    ``[num_active * n, D]``-worth of valid rows followed by padding draws —
    callers that need exact shapes should mask by ``num_active * n``."""
    draw_key, perm_key = jax.random.split(key)
    smp = sample_from_components(state, draw_key, samples_per_component)
    kmax, n, d = smp.shape
    flat = smp.reshape(-1, d)
    valid = jnp.repeat(state.mask, n)
    # stable sort: valid rows first, then shuffle within by random keys
    rand = jax.random.uniform(perm_key, (kmax * n,))
    order = jnp.argsort(jnp.where(valid, rand, 2.0), stable=True)
    return flat[order]


def sample(state: GmmState, key, num_samples: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw ``num_samples`` from the mixture; returns (samples, mapping).

    The mapping is **sorted** so samples drawn from the same component are
    contiguous; unlike the reference (gmm.py:139-163) the i-th mapping entry
    here correctly corresponds to the i-th sample.
    """
    k_key, n_key = jax.random.split(key)
    mapping = jnp.sort(sample_categorical(state, k_key, num_samples))
    eps = jax.random.normal(n_key, (num_samples, state.num_dimensions), state.means.dtype)
    mu = state.means[mapping]
    if state.diagonal:
        smp = mu + state.chols[mapping] * eps
    else:
        smp = mu + jnp.einsum("nij,nj->ni", state.chols[mapping], eps, precision=_PREC)
    return smp, mapping


# ---------------------------------------------------------------------------
# Structural updates (all statically shaped)
# ---------------------------------------------------------------------------

def normalize_log_weights(log_weights: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    lw = jnp.where(mask, log_weights, NEG_INF)
    return jnp.where(mask, lw - masked_logsumexp(lw, mask=mask, axis=0), NEG_INF)


def replace_weights(state: GmmState, new_log_weights: jnp.ndarray) -> GmmState:
    """Overwrite (and re-normalize) the active log weights
    (reference: gmm.py:173-181)."""
    return state.replace(log_weights=normalize_log_weights(new_log_weights, state.mask))


def replace_components(
    state: GmmState, new_means: jnp.ndarray, new_chols: jnp.ndarray,
    new_inv_chols: Optional[jnp.ndarray] = None,
) -> GmmState:
    """Replace means/chols of active components; refreshes inv_chol cache
    (reference: gmm.py:401-418).

    ``new_inv_chols`` lets updaters that already hold the inverse factors
    (see ``component_updaters._chol_pair_from_prec``) skip the triangular
    re-inversion here; inactive slots are padded with identity either way.
    """
    mask = state.mask
    means = jnp.where(mask[:, None], new_means, state.means)
    chols = safe_chol_pad(new_chols, mask, state.diagonal)
    if new_inv_chols is None:
        inv_chols = invert_chol(chols, state.diagonal)
    else:
        inv_chols = safe_chol_pad(new_inv_chols, mask, state.diagonal)
    return state.replace(means=means, chols=chols, inv_chols=inv_chols)


def add_component(
    state: GmmState,
    initial_weight: jnp.ndarray,
    initial_mean: jnp.ndarray,
    initial_cov: jnp.ndarray,
) -> GmmState:
    """Append a component at slot ``num_active``; renormalizes weights.

    If the state is already full this is a (silent) no-op — callers should
    grow the padding via :func:`repad` beforehand.
    (reference: full_cov_gmm.py:64-68, gmm_wrapper.py:90-127)
    """
    k = state.num_active
    kmax = state.max_components
    has_room = k < kmax
    slot = jnp.minimum(k, kmax - 1)
    if state.diagonal:
        new_chol = jnp.sqrt(initial_cov)
    else:
        new_chol = jnp.linalg.cholesky(initial_cov)

    means = state.means.at[slot].set(
        jnp.where(has_room, initial_mean, state.means[slot])
    )
    chols = state.chols.at[slot].set(
        jnp.where(has_room, new_chol, state.chols[slot])
    )
    log_w = state.log_weights.at[slot].set(
        jnp.where(has_room, jnp.log(initial_weight), state.log_weights[slot])
    )
    num_active = jnp.where(has_room, k + 1, k).astype(jnp.int32)
    new_mask = jnp.arange(kmax) < num_active
    log_w = normalize_log_weights(log_w, new_mask)
    inv = invert_chol(chols, state.diagonal)
    return state.replace(
        log_weights=log_w, means=means, chols=chols, inv_chols=inv,
        num_active=num_active,
    )


def compaction_order(keep: jnp.ndarray) -> jnp.ndarray:
    """Stable permutation placing kept slots first (for deletions)."""
    return jnp.argsort(jnp.logical_not(keep), stable=True)


def remove_components(state: GmmState, keep: jnp.ndarray) -> GmmState:
    """Remove all active components where ``keep`` is False (compacting gather);
    renormalizes weights.  Static-shape analogue of reference gmm.py:388-398.
    """
    keep = jnp.logical_and(keep, state.mask)
    order = compaction_order(keep)
    num_active = jnp.sum(keep).astype(jnp.int32)
    new_mask = jnp.arange(state.max_components) < num_active
    log_w = normalize_log_weights(state.log_weights[order], new_mask)
    chols = safe_chol_pad(state.chols[order], new_mask, state.diagonal)
    return state.replace(
        log_weights=log_w,
        means=jnp.where(new_mask[:, None], state.means[order], 0.0),
        chols=chols,
        inv_chols=invert_chol(chols, state.diagonal),
        num_active=num_active,
    )


def repad(state: GmmState, new_max_components: int) -> GmmState:
    """Grow the padded capacity (host-side utility; triggers recompiles)."""
    kmax, d = state.max_components, state.num_dimensions
    extra = new_max_components - kmax
    if extra <= 0:
        return state
    dt = state.means.dtype
    if state.diagonal:
        pad_chol = jnp.ones((extra, d), dt)
    else:
        pad_chol = jnp.tile(jnp.eye(d, dtype=dt)[None], (extra, 1, 1))
    return state.replace(
        log_weights=jnp.concatenate([state.log_weights, jnp.full((extra,), NEG_INF, dt)]),
        means=jnp.concatenate([state.means, jnp.zeros((extra, d), dt)]),
        chols=jnp.concatenate([state.chols, pad_chol]),
        inv_chols=jnp.concatenate([state.inv_chols, pad_chol]),
    )
