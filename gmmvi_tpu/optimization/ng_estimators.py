"""Natural-gradient estimators: Stein (first-order) and MORE (zero-order).

Estimate, for every component o, the negated expected gradient and Hessian of
the log density ratio ``log p(x)/q(x)``:
``gneg_o = -E_{q(x|o)}[grad log ratio]``,
``Hneg_o = -E_{q(x|o)}[hess log ratio]``
(reference: src/gmmvi/optimization/gmmvi_modules/ng_estimator.py).

TPU-native design: no per-component Python loop — the Stein estimator is a set
of masked einsum contractions over ``[Kmax, N]`` importance weights (the hot
reductions that get psum-reduced under sample sharding), and the MORE
estimator maps :func:`gmmvi_tpu.ops.quadratic.fit_quadratic` over the
component axis with ``lax.map`` (bounded memory for the ``[N, F]`` design
matrices).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gmmvi_tpu.models.gmm import GmmState, density_pack
from gmmvi_tpu.ops.quadratic import fit_quadratic
from gmmvi_tpu.ops.stable import (masked_logsumexp, signed_weighted_logsumexp,
                                  NEG_INF)

_PREC = jax.lax.Precision.HIGHEST


class NgEstimate(NamedTuple):
    expected_hessians_neg: jnp.ndarray   # [Kmax, D, D] (or [Kmax, D] diagonal)
    expected_gradients_neg: jnp.ndarray  # [Kmax, D]


def _stein_standard_iw(model, log_iw, mask, log_ratio_grads, ptd):
    """Standard-IW Stein moments with the reference's exact stable-expectation
    semantics (ng_estimator.py:146-169): per output element, a signed
    ``reduce_weighted_logsumexp`` of ``log_iw + log|value|`` over the sample
    axis, divided by the per-component sample count.  Raw ``exp(log_iw)``
    would overflow float32 at ``log_iw > ~88`` (early training: peaked
    component vs broad background) where this survives.

    Off-default path (every bundled config sets self-normalized IW), so a
    sequential ``lax.map`` over components bounds the ``[N, D, D]``
    log-magnitude intermediates exactly like the reference's per-component
    loop."""
    n = jnp.maximum(jnp.sum(mask.astype(jnp.float32), axis=1), 1.0)  # [Kmax]

    def one(args):
        log_iw_k, mask_k, ptd_k, n_k = args
        lw = jnp.where(mask_k, log_iw_k, NEG_INF)
        grad_k = signed_weighted_logsumexp(
            lw[:, None], log_ratio_grads, axis=0) / n_k
        if model.diagonal:
            vals = log_ratio_grads * ptd_k                        # [N, D]
            hess_k = signed_weighted_logsumexp(
                lw[:, None], vals, axis=0) / n_k
        else:
            # vals[n, d, e] = g[n, d] * ptd[n, e] — reference index order
            # (ng_estimator.py:165-166)
            vals = log_ratio_grads[:, :, None] * ptd_k[:, None, :]
            hess_k = signed_weighted_logsumexp(
                lw[:, None, None], vals, axis=0) / n_k
        return hess_k, grad_k

    return jax.lax.map(one, (log_iw, mask, ptd, n))


def _fused_stein_mode(model: GmmState, n: int) -> str:
    """'pallas' | 'interpret' | 'off' for the streamed Stein second-moment
    kernel (GMMVI_FUSED_STEIN overrides; same gating policy as the density /
    MORE kernels: shard_map-wrapped with psum'd partial moments under SPMD
    meshes).  Only engages above D=64 — see pallas_stein.supports — so
    small-D step graphs are unchanged."""
    import os

    from gmmvi_tpu.models import gmm as gmm_module
    from gmmvi_tpu.ops import pallas_stein

    mode = os.environ.get("GMMVI_FUSED_STEIN", "auto")
    if mode == "0":
        return "off"
    if model.diagonal or not pallas_stein.supports(model.num_dimensions, n):
        return "off"
    if gmm_module.SPMD_ACTIVE and gmm_module.spmd_data_mesh(n) is None \
            and mode not in ("1", "interpret"):
        # meshed trace, batch not evenly shardable: no shard_map wrap
        return "off"
    if mode == "interpret":
        return "interpret"
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    if mode == "1" or on_tpu:
        return "pallas"
    return "off"


def _stein_smom(model: GmmState, w, log_ratio_grads, centered_samples):
    """``sum_n w[k,n] g[n,:] xc[n,:]^T`` — streamed Pallas kernel on TPU
    (no [K, N, D] HBM intermediate), XLA einsum otherwise."""
    mode = _fused_stein_mode(model, centered_samples.shape[0])
    if mode != "off":
        from gmmvi_tpu.models import gmm as gmm_module
        from gmmvi_tpu.ops.pallas_stein import fused_stein_smom

        interpret = mode == "interpret"
        mesh = gmm_module.spmd_data_mesh(centered_samples.shape[0])
        if mesh is not None:
            # each device accumulates its sample shard's moments in one
            # kernel pass; the [K, D, D] partials psum across the mesh —
            # the same collective the einsum path's sharded contraction
            # produces
            from jax import shard_map

            P = jax.sharding.PartitionSpec

            def _local(w_l, g_l, x_l):
                return jax.lax.psum(
                    fused_stein_smom(w_l, g_l, x_l, interpret=interpret),
                    "data")

            return shard_map(
                _local, mesh=mesh,
                in_specs=(P(None, "data"), P("data"), P("data")),
                out_specs=P(), check_vma=False,
            )(w, log_ratio_grads, centered_samples)
        return fused_stein_smom(w, log_ratio_grads, centered_samples,
                                interpret=interpret)
    return jnp.einsum("kn,nd,ne->kde", w, log_ratio_grads, centered_samples,
                      precision=_PREC)


def _per_component_log_iw(
    comp_log_densities: jnp.ndarray,  # [Kmax, N]
    background: jnp.ndarray,          # [N]
    sample_mask: jnp.ndarray,         # [N]
    own_mask: jnp.ndarray,            # [Kmax, N] or None
):
    """Raw per-component log importance weights log q(x|o) - log bg(x).

    When ``own_mask`` is given (only_use_own_samples), each component only sees
    its own samples, with background := its own density, i.e. log IW = 0
    (reference: ng_estimator.py:107-120).
    """
    log_iw = comp_log_densities - background[None, :]
    mask = jnp.broadcast_to(sample_mask[None, :], log_iw.shape)
    if own_mask is not None:
        log_iw = jnp.zeros_like(log_iw)
        mask = jnp.logical_and(mask, own_mask)
    return log_iw, mask


def stein_estimate(
    model: GmmState,
    samples: jnp.ndarray,          # [N, D]
    sample_mask: jnp.ndarray,      # [N] bool
    mapping: jnp.ndarray,          # [N] generating component (for own-samples)
    background: jnp.ndarray,       # [N] log densities of sampling distribution
    target_lnpdfs: jnp.ndarray,    # [N]
    target_grads: jnp.ndarray,     # [N, D]
    use_self_normalized_importance_weights: bool = True,
    only_use_own_samples: bool = False,
    pack=None,
    newest_mask: jnp.ndarray = None,   # [N] bool: sample is from the newest add
) -> NgEstimate:
    """First-order estimator via Stein's lemma (reference: ng_estimator.py:123-263).

    E[grad]  ~= sum_n w_n g_n
    E[hess]  ~= sum_n w_n Sigma^{-1}(x_n - mu) g_n^T   (self-normalized path
    symmetrizes; standard-IW path does not — mirrored from
    ng_estimator.py:154-188).

    ``pack`` is an optional precomputed :class:`DensityPack` over ``samples``
    (the fused once-per-step density pass, shared with the background
    computation); computed here when absent.
    """
    if pack is None:
        pack = density_pack(model, samples)
    log_ratio_grads = target_grads - pack.model_grads            # [N, D]
    ptd = pack.prec_times_diff                          # [Kmax, N, D] or None

    own_mask = None
    if only_use_own_samples:
        # The reference's relative mapping (ng_estimator.py:244) aligns the
        # newest add batch's generating distributions with the current
        # components; samples of OLDER batches shift out of range and match
        # no component.  newest_mask reproduces that; without it (direct
        # calls on a single batch) slot equality alone is the same thing.
        own_mask = mapping[None, :] == jnp.arange(model.max_components)[:, None]
        if newest_mask is not None:
            own_mask = jnp.logical_and(own_mask, newest_mask[None, :])

    log_iw, mask = _per_component_log_iw(
        pack.component_log_densities, background, sample_mask, own_mask
    )

    if not use_self_normalized_importance_weights:
        # standard IW with the reference's signed-logsumexp stable expectation
        # (ng_estimator.py:146-169).  1/n uses the count of samples each
        # component sees (= the full valid window normally; the component's
        # own-sample count under only_use_own_samples, since the reference
        # passes only those to _stable_expectation).
        if ptd is None:
            # fused-kernel packs carry no [Kmax, N, D] prec_times_diff;
            # recompute it (off-default path, memory bounded by the lax.map)
            diffs = samples[None, :, :] - model.means[:, None, :]
            if model.diagonal:
                ptd = jnp.square(model.inv_chols)[:, None, :] * diffs
            else:
                lam = jnp.einsum("kji,kjl->kil", model.inv_chols,
                                 model.inv_chols, precision=_PREC)
                ptd = jnp.einsum("kde,kne->knd", lam, diffs, precision=_PREC)
        hess, grad = _stein_standard_iw(model, log_iw, mask,
                                        log_ratio_grads, ptd)
        return NgEstimate(-hess, -grad)

    # self-normalized IW
    # (reference: ng_estimator.py:171-188, incl. the double normalization)
    log_w = log_iw - masked_logsumexp(log_iw, mask=mask, axis=1, keepdims=True)
    w = jnp.where(mask, jnp.exp(log_w), 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-38)

    grad = jnp.einsum("kn,nd->kd", w, log_ratio_grads, precision=_PREC)
    if model.diagonal:
        # diagonal path keeps only the elementwise products
        # (reference: ng_estimator.py:159-162, 178-181)
        hess = jnp.einsum(
            "kn,nd,knd->kd", w, log_ratio_grads, ptd, precision=_PREC
        )
    elif ptd is None:
        # moment form (fused-kernel packs carry no [K, N, D] ptd):
        # H[k] = E[g (Lam_k(x - mu_k))^T]
        #      = (sum_n w g (x-c)^T) Lam_k - (sum_n w g) (Lam_k (mu_k-c))^T
        # with a global centering shift c (the active-means centroid) to
        # avoid float cancellation when the mixture sits far from the origin
        lam = jnp.einsum("kji,kjl->kil", model.inv_chols, model.inv_chols,
                         precision=_PREC)
        shift = jnp.sum(jnp.where(model.mask[:, None], model.means, 0.0), 0) \
            / jnp.maximum(jnp.sum(model.mask), 1)
        lam_mu = jnp.einsum("kde,ke->kd", lam, model.means - shift[None, :],
                            precision=_PREC)
        s_mom = _stein_smom(model, w, log_ratio_grads,
                            samples - shift[None, :])
        hess = jnp.einsum("kdf,kfe->kde", s_mom, lam, precision=_PREC) \
            - grad[:, :, None] * lam_mu[:, None, :]
        # symmetrization only in the SN path (ng_estimator.py:186)
        hess = 0.5 * (hess + jnp.swapaxes(hess, -1, -2))
    else:
        # H[d, e] = E[g_d * ptd_e] — matches reference index order
        # (ng_estimator.py:165-166: grads expand to [N,D,1], ptd to [N,1,D])
        hess = jnp.einsum(
            "kn,nd,kne->kde", w, log_ratio_grads, ptd, precision=_PREC
        )
        hess = 0.5 * (hess + jnp.swapaxes(hess, -1, -2))
    return NgEstimate(-hess, -grad)


def more_estimate(
    model: GmmState,
    samples: jnp.ndarray,
    sample_mask: jnp.ndarray,
    mapping: jnp.ndarray,
    background: jnp.ndarray,
    target_lnpdfs: jnp.ndarray,
    l2_regularizers: jnp.ndarray,  # [Kmax]
    use_self_normalized_importance_weights: bool = True,
    only_use_own_samples: bool = False,
    pack=None,
    newest_mask: jnp.ndarray = None,   # [N] bool: sample is from the newest add
) -> NgEstimate:
    """Zero-order estimator via a quadratic compatible surrogate
    (reference: ng_estimator.py:266-376): fit R~(x) = x^T Q x + x^T r + r0 by
    importance-weighted ridge regression on the log *ratios*, then
    ``Hneg = quad_term``, ``gneg = quad_term @ mu - lin_term``.
    """
    from gmmvi_tpu.models.gmm import log_densities_also_individual

    if pack is None:
        model_densities, comp_log_densities = log_densities_also_individual(
            model, samples)
    else:
        model_densities = pack.model_log_densities
        comp_log_densities = pack.component_log_densities
    log_ratios = target_lnpdfs - model_densities

    own_mask = None
    if only_use_own_samples:
        # newest-batch-only semantics; see stein_estimate
        own_mask = mapping[None, :] == jnp.arange(model.max_components)[:, None]
        if newest_mask is not None:
            own_mask = jnp.logical_and(own_mask, newest_mask[None, :])

    log_iw, mask = _per_component_log_iw(
        comp_log_densities, background, sample_mask, own_mask
    )

    if use_self_normalized_importance_weights:
        log_w = log_iw - masked_logsumexp(log_iw, mask=mask, axis=1, keepdims=True)
        w = jnp.where(mask, jnp.exp(log_w), 0.0)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-38)
    else:
        # deliberately raw exp: the reference's MORE path also feeds raw
        # exp(log_iw) into the regression (ng_estimator.py:361) — unlike its
        # Stein path, no stable-expectation trick is applied there
        w = jnp.where(mask, jnp.exp(log_iw), 0.0)

    def fit_one(args):
        weights_k, reg_k, mean_k, inv_chol_k = args
        quad, lin, _ = fit_quadratic(
            reg_k,
            samples,
            log_ratios,
            weights_k,
            mean_k,
            inv_chol_k,
            mask=sample_mask,
            diagonal=model.diagonal,
        )
        if model.diagonal:
            hneg = jnp.diagonal(quad) if quad.ndim == 2 else quad
            gneg = hneg * mean_k - lin
        else:
            hneg = quad
            gneg = quad @ mean_k - lin
        return hneg, gneg

    mode = _fused_more_mode(model, samples.shape[0])
    if mode != "off":
        # one streamed pass builds every component's weighted normal
        # equations (whiten + features + Gram fused in VMEM; no [N, F]
        # design matrices in HBM); solve + unwhiten stay in XLA
        from gmmvi_tpu.models import gmm as gmm_module
        from gmmvi_tpu.ops.pallas_more import fused_more_grams
        from gmmvi_tpu.ops.quadratic import solve_quadratic_normal_eqs

        w_masked = jnp.where(sample_mask[None, :], w, 0.0)
        interpret = mode == "interpret"
        mesh = gmm_module.spmd_data_mesh(samples.shape[0])
        if mesh is not None:
            # shard_map over the data axis: each device accumulates the
            # weighted normal equations of its sample shard in one kernel
            # pass, then the [K, F, F] / [K, F] partial sums psum across the
            # mesh — the same (tiny, per-component) collective payload the
            # XLA estimator path produces
            from jax import shard_map

            P = jax.sharding.PartitionSpec

            def _local(inv_chols, means, w_m, y, x):
                g, r = fused_more_grams(inv_chols, means, w_m, y, x,
                                        interpret=interpret)
                return jax.lax.psum((g, r), "data")

            gram, rhs = shard_map(
                _local, mesh=mesh,
                in_specs=(P(), P(), P(None, "data"), P("data"), P("data")),
                out_specs=(P(), P()), check_vma=False,
            )(model.inv_chols, model.means, w_masked, log_ratios, samples)
        else:
            gram, rhs = fused_more_grams(
                model.inv_chols, model.means, w_masked, log_ratios, samples,
                interpret=interpret)

        def finish(args):
            gram_k, rhs_k, reg_k, mean_k, inv_chol_k = args
            quad, lin, _ = solve_quadratic_normal_eqs(
                gram_k, rhs_k, reg_k, mean_k, inv_chol_k, diagonal=False)
            return quad, quad @ mean_k - lin

        hneg, gneg = jax.vmap(finish)(
            (gram, rhs, l2_regularizers, model.means, model.inv_chols))
        return NgEstimate(hneg, gneg)

    # sequential map over K: measured FASTER than chunked vmap on v5e
    # (chunk 1/4/16/48 -> 30/30/38/39 ms per ZAMTRON stm20 iteration; the
    # [chunk, N, F] design matrices blow past cache and the fits become
    # HBM-bound).  GMMVI_MORE_CHUNK overrides for experimentation.
    import os

    env = os.environ.get("GMMVI_MORE_CHUNK")
    chunk = max(1, min(model.max_components, int(env))) if env else 1
    hneg, gneg = jax.lax.map(
        fit_one, (w, l2_regularizers, model.means, model.inv_chols),
        batch_size=chunk,
    )
    return NgEstimate(hneg, gneg)


def _fused_more_mode(model: GmmState, n: int) -> str:
    """'pallas' | 'interpret' | 'off' for the fused MORE Gram kernel
    (GMMVI_FUSED_MORE overrides; same gating policy as the density kernels:
    shard_map-wrapped with psum'd partial Grams under SPMD meshes, off for
    diagonal models, whose whitening is cheap elementwise anyway)."""
    import os

    from gmmvi_tpu.models import gmm as gmm_module
    from gmmvi_tpu.ops import pallas_more

    mode = os.environ.get("GMMVI_FUSED_MORE", "auto")
    if mode == "0":
        return "off"
    if model.diagonal or not pallas_more.supports(model.num_dimensions, n):
        return "off"
    if gmm_module.SPMD_ACTIVE and gmm_module.spmd_data_mesh(n) is None \
            and mode not in ("1", "interpret"):
        # meshed trace, batch not evenly shardable: no shard_map wrap
        return "off"
    if mode == "interpret":
        return "interpret"
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    if mode == "1" or on_tpu:
        return "pallas"
    return "off"
