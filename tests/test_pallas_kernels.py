"""Pallas fused mixture-logpdf kernel vs the plain XLA path (interpret mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gmmvi_tpu.ops.pallas_kernels import (
    _plain_mixture_logpdf,
    fused_mixture_logpdf,
)


def _mixture(k, d, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.randn(k, d).astype(np.float32) * 2
    a = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    chols = np.linalg.cholesky(covs)
    inv_chols = np.linalg.inv(chols).astype(np.float32)
    log_dets = np.sum(np.log(np.diagonal(chols, axis1=-2, axis2=-1)),
                      axis=-1).astype(np.float32)
    lw = rng.dirichlet(np.ones(k)).astype(np.float32)
    return means, inv_chols, np.log(lw), log_dets


@pytest.mark.parametrize("k,d,n", [(3, 5, 70), (17, 20, 600)])
def test_fused_matches_plain(k, d, n):
    means, inv_chols, log_w, log_dets = _mixture(k, d)
    rng = np.random.RandomState(1)
    samples = (rng.randn(n, d) * 2).astype(np.float32)

    plain = np.asarray(_plain_mixture_logpdf(
        jnp.asarray(means), jnp.asarray(inv_chols), jnp.asarray(log_w),
        jnp.asarray(log_dets), jnp.asarray(samples),
    ))
    fused = np.asarray(fused_mixture_logpdf(
        jnp.asarray(means), jnp.asarray(inv_chols), jnp.asarray(log_w),
        jnp.asarray(log_dets), jnp.asarray(samples), interpret=True,
    ))
    np.testing.assert_allclose(fused, plain, rtol=1e-4, atol=1e-4)


def test_fused_handles_masked_components():
    k, d, n = 6, 4, 40
    means, inv_chols, log_w, log_dets = _mixture(k, d, seed=2)
    log_w[4:] = -np.inf  # masked slots
    rng = np.random.RandomState(3)
    samples = rng.randn(n, d).astype(np.float32)
    plain = np.asarray(_plain_mixture_logpdf(
        jnp.asarray(means[:4]), jnp.asarray(inv_chols[:4]),
        jnp.asarray(log_w[:4] - np.log(np.exp(log_w[:4]).sum())),
        jnp.asarray(log_dets[:4]), jnp.asarray(samples),
    ))
    lw_full = log_w.copy()
    lw_full[:4] -= np.log(np.exp(log_w[:4]).sum())
    fused = np.asarray(fused_mixture_logpdf(
        jnp.asarray(means), jnp.asarray(inv_chols), jnp.asarray(lw_full),
        jnp.asarray(log_dets), jnp.asarray(samples), interpret=True,
    ))
    np.testing.assert_allclose(fused, plain, rtol=1e-4, atol=1e-4)


def test_fused_density_pack_matches_xla():
    """The block-diagonal fused density kernel (interpret mode) matches the
    XLA density_pack: comp log-densities, mixture density, analytic grads."""
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.ops.pallas_density import (
        fused_component_densities, fused_density_pack,
    )

    rng = np.random.RandomState(0)
    k, kmax, n, d = 11, 16, 700, 5
    means = rng.randn(k, d).astype(np.float32) * 3
    a = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    w = rng.dirichlet(np.ones(k)).astype(np.float32)
    state = G.create_gmm_state(w, means, covs, max_components=kmax)
    x = jnp.asarray((rng.randn(n, d) * 2 + means[2]).astype(np.float32))

    pack = G.density_pack(state, x)
    logdets = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(
        state.chols, axis1=-2, axis2=-1))), -1)
    comp, model, grads = fused_density_pack(
        state.means, state.inv_chols, state.log_weights, logdets, x,
        interpret=True)
    np.testing.assert_allclose(np.asarray(comp[:k]),
                               np.asarray(pack.component_log_densities[:k]),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(model),
                               np.asarray(pack.model_log_densities), atol=5e-4)
    np.testing.assert_allclose(np.asarray(grads),
                               np.asarray(pack.model_grads), atol=5e-4)

    comp2, model2 = fused_component_densities(
        state.means, state.inv_chols, state.log_weights, logdets, x,
        interpret=True)
    np.testing.assert_allclose(np.asarray(comp2), np.asarray(comp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(model2), np.asarray(model),
                               atol=1e-6)


@pytest.mark.parametrize("u,d,n", [(7, 5, 600), (70, 60, 520),
                                   (40, 300, 640), (12, 450, 384)])
def test_fused_background_logpdf_matches_xla(u, d, n):
    """The streaming (U-tiled, online-logsumexp) background kernel matches
    the XLA chain, including masked dists and multiple U tiles (the second
    case spans 3 tiles at u_tile=32; the third exercises the large-D
    (u_tile, n_tile) budget path at D=300; the fourth the D>360 route
    through the K-tiled density stream, where u_tile drops to 4)."""
    from gmmvi_tpu.ops.pallas_density import fused_background_logpdf

    rng = np.random.RandomState(0)
    means = rng.randn(u, d).astype(np.float32) * 3
    a = rng.randn(u, d, d).astype(np.float32) * 0.3
    covs = np.einsum("uij,ulj->uil", a, a) + np.eye(d, dtype=np.float32)
    chols = np.linalg.cholesky(covs).astype(np.float32)
    inv_chols = np.stack([np.linalg.inv(c) for c in chols]).astype(np.float32)
    log_dets = np.sum(np.log(np.diagonal(chols, axis1=-2, axis2=-1)),
                      axis=-1).astype(np.float32)
    log_w = np.log(rng.dirichlet(np.ones(u))).astype(np.float32)
    log_w[u // 3:: 3] = -np.inf  # some unselected rows
    x = (rng.randn(n, d) * 2).astype(np.float32)

    # XLA oracle
    diffs = x[None] - means[:, None]
    y = np.einsum("uij,unj->uni", inv_chols, diffs)
    lp = (-0.5 * np.sum(y * y, -1) - log_dets[:, None]
          - 0.5 * d * np.log(2 * np.pi))
    sel = np.isfinite(log_w)
    stacked = lp[sel] + log_w[sel][:, None]
    m = stacked.max(0)
    want = np.log(np.exp(stacked - m).sum(0)) + m

    got = np.asarray(fused_background_logpdf(
        jnp.asarray(means), jnp.asarray(inv_chols), jnp.asarray(log_w),
        jnp.asarray(log_dets), jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_sample_axis_chunking_matches_unchunked():
    """Past _N_CHUNK samples the dispatchers split the sample axis (the
    streaming kernels' full-width [8, N_pad] online-logsumexp scratch
    overflowed VMEM at a fully-preallocated stm20 window, ~200k samples).
    Chunked and unchunked results must match exactly."""
    from gmmvi_tpu.ops import pallas_density as pd
    from gmmvi_tpu.ops import pallas_density_large as pdl

    rng = np.random.RandomState(3)
    u, d, n = 9, 150, 1500
    means = rng.randn(u, d).astype(np.float32)
    a = rng.randn(u, d, d).astype(np.float32) * 0.2
    covs = np.einsum("uij,ulj->uil", a, a) + np.eye(d, dtype=np.float32)
    chols = np.linalg.cholesky(covs).astype(np.float32)
    inv_chols = np.stack([np.linalg.inv(c) for c in chols]).astype(np.float32)
    log_dets = np.sum(np.log(np.diagonal(chols, axis1=-2, axis2=-1)),
                      axis=-1).astype(np.float32)
    log_w = np.log(rng.dirichlet(np.ones(u))).astype(np.float32)
    x = (rng.randn(n, d) * 2).astype(np.float32)
    args = (jnp.asarray(means), jnp.asarray(inv_chols), jnp.asarray(log_w),
            jnp.asarray(log_dets), jnp.asarray(x))

    want = pdl.fused_density_pack_large(*args, interpret=True)
    want_bg = pd.fused_background_logpdf(*args, interpret=True)
    old = pd._N_CHUNK
    try:
        pd._N_CHUNK = 512  # force 3 chunks
        got = pdl.fused_density_pack_large(*args, interpret=True)
        got_bg = pd.fused_background_logpdf(*args, interpret=True)
    finally:
        pd._N_CHUNK = old
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_bg), np.asarray(want_bg),
                               rtol=1e-6, atol=1e-6)


def test_background_logsumexp_dispatch_matches():
    """sample_db._background_logsumexp: interpret-kernel result matches the
    XLA fallback on the same inputs (the wiring used inside
    get_newest_samples / get_newest_samples_fused)."""
    import os

    from gmmvi_tpu.optimization import sample_db as DB

    rng = np.random.RandomState(4)
    u, d, n = 9, 6, 600
    means = rng.randn(u, d).astype(np.float32)
    a = rng.randn(u, d, d).astype(np.float32) * 0.3
    covs = np.einsum("uij,ulj->uil", a, a) + np.eye(d, dtype=np.float32)
    chols = np.linalg.cholesky(covs).astype(np.float32)
    inv_chols = np.stack([np.linalg.inv(c) for c in chols]).astype(np.float32)
    log_dets = np.sum(np.log(np.diagonal(chols, axis1=-2, axis2=-1)),
                      axis=-1).astype(np.float32)
    log_w = np.log(rng.dirichlet(np.ones(u))).astype(np.float32)
    sel = np.ones(u, bool)
    sel[5:] = False
    x = (rng.randn(n, d)).astype(np.float32)
    db = DB.create_sample_db(dim=d, max_components=4, capacity=64,
                             dist_ring_iters=2, reservoir_capacity=16)

    args = (db, jnp.asarray(means), jnp.asarray(inv_chols),
            jnp.asarray(log_dets), jnp.asarray(log_w), jnp.asarray(sel),
            jnp.asarray(x))
    old = os.environ.get("GMMVI_FUSED_DENSITY")
    try:
        os.environ["GMMVI_FUSED_DENSITY"] = "interpret"
        got = np.asarray(DB._background_logsumexp(*args))
        os.environ["GMMVI_FUSED_DENSITY"] = "0"
        want = np.asarray(DB._background_logsumexp(*args))
    finally:
        if old is None:
            os.environ.pop("GMMVI_FUSED_DENSITY", None)
        else:
            os.environ["GMMVI_FUSED_DENSITY"] = old
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_stein_moment_form_matches_ptd_form():
    """Packs without prec_times_diff (fused-kernel packs) drive the Stein
    estimator through the moment form — must match the direct form."""
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization.ng_estimators import stein_estimate

    rng = np.random.RandomState(1)
    k, n, d = 5, 600, 4
    means = rng.randn(k, d).astype(np.float32) * 2 + 7.0  # off-origin
    a = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    state = G.create_gmm_state(np.full(k, 1.0 / k, np.float32), means, covs,
                               max_components=k)
    x = jnp.asarray((rng.randn(n, d) * 2 + 7.0).astype(np.float32))
    bg = jnp.asarray(rng.randn(n).astype(np.float32) - 4.0)
    lnp = jnp.asarray(rng.randn(n).astype(np.float32))
    grads = jnp.asarray(rng.randn(n, d).astype(np.float32))
    mask = jnp.ones(n, bool)
    mapping = jnp.asarray(rng.randint(0, k, n), jnp.int32)

    pack = G.density_pack(state, x)
    pack_no_ptd = pack.replace(prec_times_diff=None)
    for sniw in (True, False):
        e1 = stein_estimate(state, x, mask, mapping, bg, lnp, grads,
                            use_self_normalized_importance_weights=sniw,
                            pack=pack)
        e2 = stein_estimate(state, x, mask, mapping, bg, lnp, grads,
                            use_self_normalized_importance_weights=sniw,
                            pack=pack_no_ptd)
        np.testing.assert_allclose(np.asarray(e1.expected_gradients_neg),
                                   np.asarray(e2.expected_gradients_neg),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(e1.expected_hessians_neg),
                                   np.asarray(e2.expected_hessians_neg),
                                   rtol=1e-4, atol=1e-5)


def test_tr_kl_kernel_matches_xla():
    """The batched trust-region KL kernel (interpret mode) matches
    _tr_kl_full per component, including infeasibility (non-PD) flags."""
    from gmmvi_tpu.optimization.component_updaters import _tr_kl_full
    from gmmvi_tpu.ops.pallas_trust_region import (
        F32_MAX, batched_tr_kl, prepare_tr_kl_inputs,
    )

    rng = np.random.RandomState(0)
    k, d = 7, 5
    means = rng.randn(k, d).astype(np.float32) * 3
    a = rng.randn(k, d, d).astype(np.float32) * 0.4
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    chols = np.linalg.cholesky(covs).astype(np.float32)
    inv_chols = np.stack([np.linalg.inv(c) for c in chols]).astype(np.float32)
    h = rng.randn(k, d, d).astype(np.float32) * 0.5
    # indefinite curvature so small etas go infeasible
    reward_quad = (np.einsum("kij,klj->kil", h, h)
                   - 0.3 * np.eye(d, dtype=np.float32)).astype(np.float32)
    reward_lin = rng.randn(k, d).astype(np.float32)

    prec = np.einsum("kji,kjl->kil", inv_chols, inv_chols)
    old_lin = np.einsum("kij,kj->ki", prec, means)
    old_logdet = 2 * np.sum(
        np.log(np.abs(np.diagonal(chols, axis1=-2, axis2=-1))), -1)
    kl_const = old_logdet - d

    packed = prepare_tr_kl_inputs(
        jnp.asarray(means), jnp.asarray(chols), jnp.asarray(inv_chols),
        jnp.asarray(reward_lin), jnp.asarray(reward_quad))
    n_inf = 0
    for scale in (0.5, 2.0, 50.0):
        etas = jnp.asarray(
            rng.uniform(0.3, 1.0, k).astype(np.float32) * scale)
        got = np.asarray(batched_tr_kl(etas, packed, d=d, interpret=True))
        ref = np.asarray([
            float(_tr_kl_full(
                etas[i], jnp.asarray(old_lin[i]), jnp.asarray(prec[i]),
                jnp.asarray(inv_chols[i]), jnp.asarray(reward_lin[i]),
                jnp.asarray(reward_quad[i]), kl_const[i],
                jnp.asarray(means[i]))[0])
            for i in range(k)
        ])
        inf = ref > 1e37
        n_inf += int(inf.sum())
        np.testing.assert_array_equal(got > 1e37, inf)
        np.testing.assert_allclose(got[~inf], ref[~inf], rtol=1e-5,
                                   atol=1e-5)
    assert n_inf > 0  # the infeasible branch was exercised


def test_tr_update_pallas_matches_xla_path():
    """trust_region_update via the fused kernel (interpret) is bitwise equal
    to the vmapped XLA bisection: same visited-eta sequence, same final
    reconstruction."""
    import os

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.models.meta import create_meta_state
    import gmmvi_tpu.optimization.component_updaters as CU

    rng = np.random.RandomState(3)
    k, kmax, d = 5, 8, 6
    means = rng.randn(k, d).astype(np.float32) * 2
    a = rng.randn(k, d, d).astype(np.float32) * 0.4
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    w = rng.dirichlet(np.ones(k)).astype(np.float32)
    model = G.create_gmm_state(w, means, covs, max_components=kmax)
    meta = create_meta_state(model, initial_stepsize=0.01,
                             initial_regularizer=1e-12,
                             max_reward_history_length=10)
    meta = meta.replace(last_etas=jnp.asarray(
        [5.0, -1.0, 20.0, -1.0, 2.0, -1.0, -1.0, -1.0], jnp.float32))
    h = rng.randn(kmax, d, d).astype(np.float32) * 0.3
    hneg = jnp.asarray(np.einsum("kij,klj->kil", h, h)
                       + 0.05 * np.eye(d, dtype=np.float32))
    gneg = jnp.asarray(rng.randn(kmax, d).astype(np.float32))
    steps = jnp.asarray(np.full(kmax, 0.05, np.float32))

    old = os.environ.get("GMMVI_FUSED_TR")
    try:
        os.environ["GMMVI_FUSED_TR"] = "interpret"
        r_pal = CU.trust_region_update(model, meta, hneg, gneg, steps)
        os.environ["GMMVI_FUSED_TR"] = "0"
        r_xla = CU.trust_region_update(model, meta, hneg, gneg, steps)
    finally:
        if old is None:
            os.environ.pop("GMMVI_FUSED_TR", None)
        else:
            os.environ["GMMVI_FUSED_TR"] = old
    np.testing.assert_array_equal(np.asarray(r_pal.model.means),
                                  np.asarray(r_xla.model.means))
    np.testing.assert_array_equal(np.asarray(r_pal.model.chols),
                                  np.asarray(r_xla.model.chols))
    np.testing.assert_array_equal(np.asarray(r_pal.meta.last_etas),
                                  np.asarray(r_xla.meta.last_etas))


def test_fused_density_pack_large_kd_tiles():
    """Regression: K_pad*D near the 2048 bound picks a smaller N tile
    (kd=1984 with T=512 measured a 16.01 MB scoped-VMEM overflow on v5e at
    the breast-cancer shape, K_pad=64, D=31) and still matches XLA."""
    from gmmvi_tpu.ops.pallas_density import _pick_n_tile, fused_density_pack
    from gmmvi_tpu.models import gmm as G

    assert _pick_n_tile(960, passes=2) == 512   # flagship: unchanged
    assert _pick_n_tile(1984, passes=2) == 256  # breast-cancer: halved

    rng = np.random.RandomState(3)
    k, d, n = 60, 31, 700
    w = rng.dirichlet(np.ones(k)).astype(np.float32)
    mu = rng.randn(k, d).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32) * 0.2
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    state = G.create_gmm_state(w, mu, covs, max_components=64)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))

    logdets = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(
        state.chols, axis1=-2, axis2=-1))), axis=-1)
    lw = jnp.where(state.mask, state.log_weights, -jnp.inf)
    comp, model, grads = fused_density_pack(
        state.means, state.inv_chols, lw, logdets, x, interpret=True)

    want_comp = np.asarray(G.component_log_densities(state, x))
    want_model = np.asarray(G.log_density(state, x))
    np.testing.assert_allclose(np.asarray(comp)[:k], want_comp[:k],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(model), want_model,
                               rtol=2e-4, atol=2e-4)


def test_fused_more_grams_matches_fit_quadratic():
    """The streamed MORE Gram kernel + XLA solve must reproduce
    fit_quadratic exactly (same normal equations, same feature ordering)."""
    from gmmvi_tpu.ops.pallas_more import fused_more_grams
    from gmmvi_tpu.ops.quadratic import (fit_quadratic,
                                         solve_quadratic_normal_eqs)

    rng = np.random.RandomState(5)
    k, d, n = 5, 7, 600
    means = rng.randn(k, d).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    inv_chols = np.stack([np.linalg.inv(np.linalg.cholesky(c))
                          for c in covs]).astype(np.float32)
    x = rng.randn(n, d).astype(np.float32)
    y = rng.randn(n).astype(np.float32)
    w = rng.rand(k, n).astype(np.float32)
    w[:, -50:] = 0.0  # masked tail
    regs = (10.0 ** rng.uniform(-8, -2, k)).astype(np.float32)

    gram, rhs = fused_more_grams(
        jnp.asarray(inv_chols), jnp.asarray(means), jnp.asarray(w),
        jnp.asarray(y), jnp.asarray(x), interpret=True)

    for i in range(k):
        quad_f, lin_f, const_f = solve_quadratic_normal_eqs(
            gram[i], rhs[i], jnp.asarray(regs[i]), jnp.asarray(means[i]),
            jnp.asarray(inv_chols[i]))
        quad_d, lin_d, const_d = fit_quadratic(
            jnp.asarray(regs[i]), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(w[i]), jnp.asarray(means[i]),
            jnp.asarray(inv_chols[i]))
        np.testing.assert_allclose(np.asarray(quad_f), np.asarray(quad_d),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(lin_f), np.asarray(lin_d),
                                   rtol=2e-3, atol=2e-3)


def test_more_estimate_fused_matches_map_path():
    """more_estimate through the interpret-mode kernel equals the lax.map
    XLA path on identical inputs."""
    import os

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization import ng_estimators as E

    rng = np.random.RandomState(6)
    k, d, n = 4, 5, 600
    weights = rng.dirichlet(np.ones(k)).astype(np.float32)
    mu = rng.randn(k, d).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    state = G.create_gmm_state(weights, mu, covs, max_components=k + 2)
    samples = jnp.asarray(rng.randn(n, d).astype(np.float32))
    mask = np.ones(n, bool)
    mask[-40:] = False
    mapping = jnp.asarray(rng.randint(0, k, n).astype(np.int32))
    bg = G.log_density(state, samples)
    lnpdfs = jnp.asarray(rng.randn(n).astype(np.float32))
    regs = jnp.asarray(
        (10.0 ** rng.uniform(-8, -4, k + 2)).astype(np.float32))

    args = (state, samples, jnp.asarray(mask), mapping, bg, lnpdfs, regs)
    old = os.environ.get("GMMVI_FUSED_MORE")
    try:
        os.environ["GMMVI_FUSED_MORE"] = "interpret"
        got = E.more_estimate(*args)
        os.environ["GMMVI_FUSED_MORE"] = "0"
        want = E.more_estimate(*args)
    finally:
        if old is None:
            os.environ.pop("GMMVI_FUSED_MORE", None)
        else:
            os.environ["GMMVI_FUSED_MORE"] = old
    np.testing.assert_allclose(np.asarray(got.expected_hessians_neg),
                               np.asarray(want.expected_hessians_neg),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.expected_gradients_neg),
                               np.asarray(want.expected_gradients_neg),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("k,d,n", [(20, 300, 700), (150, 33, 600),
                                   (9, 512, 300)])
def test_large_d_density_kernels_match_xla(k, d, n):
    """K-tiled streaming kernels (pallas_density_large): densities, mixture
    logsumexp, and gradients equal the XLA path across the envelope —
    large D (stm300 regime), small-D/large-K (beyond the VMEM-resident
    kernel's K_pad*D cap), and the D=512 edge."""
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.ops.pallas_density_large import (
        fused_component_densities_large, fused_density_pack_large, supports)

    assert supports(d)
    rng = np.random.RandomState(d)
    w = rng.rand(k).astype(np.float32) + 0.1
    mu = (rng.randn(k, d) * 3).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32) * 0.1
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    st = G.create_gmm_state(w / w.sum(), mu, covs, max_components=k + 3)
    x = (rng.randn(n, d) * 2 + mu[0]).astype(np.float32)

    pack = G.density_pack(st, jnp.asarray(x))  # XLA path on CPU
    logdets = np.sum(np.log(np.abs(np.diagonal(
        np.asarray(st.chols), axis1=-2, axis2=-1))), -1)
    logw = np.where(np.asarray(st.mask), np.asarray(st.log_weights), -np.inf)
    comp, model, grads = fused_density_pack_large(
        st.means, st.inv_chols, jnp.asarray(logw), jnp.asarray(logdets),
        jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(
        np.asarray(comp)[:k], np.asarray(pack.component_log_densities)[:k],
        rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(model), np.asarray(pack.model_log_densities),
        rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(grads), np.asarray(pack.model_grads),
        rtol=2e-3, atol=2e-3)

    c2, m2 = fused_component_densities_large(
        st.means, st.inv_chols, jnp.asarray(logw), jnp.asarray(logdets),
        jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(comp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(model), rtol=1e-6)


def test_large_d_dispatch_through_density_pack():
    """GMMVI_FUSED_DENSITY=interpret at D=300 routes density_pack through
    the K-tiled kernels (the small-D kernel does not support it)."""
    import os

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.ops import pallas_density

    d, k, n = 200, 6, 520
    assert not pallas_density.supports(d, k)
    rng = np.random.RandomState(1)
    mu = rng.randn(k, d).astype(np.float32)
    covs = np.tile(np.eye(d, dtype=np.float32)[None], (k, 1, 1))
    st = G.create_gmm_state(np.ones(k, np.float32) / k, mu, covs,
                            max_components=k)
    x = rng.randn(n, d).astype(np.float32)

    old = os.environ.get("GMMVI_FUSED_DENSITY")
    try:
        os.environ["GMMVI_FUSED_DENSITY"] = "0"
        plain = G.density_pack(st, jnp.asarray(x))
        os.environ["GMMVI_FUSED_DENSITY"] = "interpret"
        fused = G.density_pack(st, jnp.asarray(x))
    finally:
        if old is None:
            os.environ.pop("GMMVI_FUSED_DENSITY", None)
        else:
            os.environ["GMMVI_FUSED_DENSITY"] = old
    assert fused.prec_times_diff is None  # kernel-produced pack
    np.testing.assert_allclose(
        np.asarray(fused.model_log_densities),
        np.asarray(plain.model_log_densities), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(fused.model_grads), np.asarray(plain.model_grads),
        rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("k,d,n", [(5, 70, 700), (9, 130, 600)])
def test_fused_stein_smom_matches_einsum(k, d, n):
    """Streamed Stein second-moment kernel vs the XLA einsum, incl. K/D/N
    padding remainders (d=70 -> d_pad=72; n pads to the 512 tile)."""
    from gmmvi_tpu.ops.pallas_stein import fused_stein_smom, supports

    assert supports(d, n)
    rng = np.random.RandomState(3)
    w = rng.rand(k, n).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    g = rng.randn(n, d).astype(np.float32)
    xc = rng.randn(n, d).astype(np.float32)
    want = np.einsum("kn,nd,ne->kde", w, g, xc)

    exact = fused_stein_smom(jnp.asarray(w), jnp.asarray(g), jnp.asarray(xc),
                             interpret=True, mm="f32")
    np.testing.assert_allclose(np.asarray(exact), want, rtol=1e-5, atol=1e-5)

    split = fused_stein_smom(jnp.asarray(w), jnp.asarray(g), jnp.asarray(xc),
                             interpret=True, mm="bf16x3")
    np.testing.assert_allclose(np.asarray(split), want, rtol=2e-3, atol=2e-3)


def test_stein_estimate_fused_smom_matches_einsum_path():
    """stein_estimate with GMMVI_FUSED_STEIN=interpret (kernel) vs =0
    (einsum) on a moment-form pack: same estimate."""
    import os

    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization.ng_estimators import stein_estimate

    rng = np.random.RandomState(7)
    k, n, d = 6, 900, 96
    means = rng.randn(k, d).astype(np.float32) * 2 + 5.0
    a = rng.randn(k, d, d).astype(np.float32) * 0.05
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    state = G.create_gmm_state(np.full(k, 1.0 / k, np.float32), means, covs,
                               max_components=k)
    x = jnp.asarray((rng.randn(n, d) + 5.0).astype(np.float32))
    bg = jnp.asarray(rng.randn(n).astype(np.float32) - 4.0)
    lnp = jnp.asarray(rng.randn(n).astype(np.float32))
    grads = jnp.asarray(rng.randn(n, d).astype(np.float32))
    mask = jnp.ones(n, bool)
    mapping = jnp.asarray(rng.randint(0, k, n), jnp.int32)

    pack = G.density_pack(state, x).replace(prec_times_diff=None)
    old = os.environ.get("GMMVI_FUSED_STEIN")
    try:
        os.environ["GMMVI_FUSED_STEIN"] = "0"
        plain = stein_estimate(state, x, mask, mapping, bg, lnp, grads,
                               pack=pack)
        os.environ["GMMVI_FUSED_STEIN"] = "interpret"
        fused = stein_estimate(state, x, mask, mapping, bg, lnp, grads,
                               pack=pack)
    finally:
        if old is None:
            os.environ.pop("GMMVI_FUSED_STEIN", None)
        else:
            os.environ["GMMVI_FUSED_STEIN"] = old
    np.testing.assert_allclose(np.asarray(fused.expected_gradients_neg),
                               np.asarray(plain.expected_gradients_neg),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused.expected_hessians_neg),
                               np.asarray(plain.expected_hessians_neg),
                               rtol=2e-3, atol=2e-3)
