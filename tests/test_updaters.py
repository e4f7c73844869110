"""Component-updater tests: closed forms, KL trust region, rejection."""
import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.models import meta as M
from gmmvi_tpu.optimization.component_updaters import (
    direct_update,
    iblr_update,
    trust_region_update,
)


def _setup(k=2, d=3, kmax=4, seed=0, stepsize=0.5, diagonal=False):
    rng = np.random.RandomState(seed)
    w = np.ones(k, np.float32) / k
    mu = rng.randn(k, d).astype(np.float32)
    if diagonal:
        covs = rng.uniform(0.5, 2.0, (k, d)).astype(np.float32)
    else:
        a = rng.randn(k, d, d).astype(np.float32)
        covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    model = G.create_gmm_state(w, mu, covs, max_components=kmax,
                               diagonal=diagonal)
    meta = M.create_meta_state(model, initial_stepsize=stepsize,
                               initial_regularizer=1e-12,
                               max_reward_history_length=4)
    return model, meta


def _spd(rng, d, scale=1.0):
    a = rng.randn(d, d)
    return (scale * (a @ a.T) + 0.5 * np.eye(d)).astype(np.float32)


def gauss_kl(mean0, cov0, mean1, cov1):
    """KL(N0 || N1)."""
    d = len(mean0)
    c1inv = np.linalg.inv(cov1)
    diff = mean1 - mean0
    return 0.5 * (
        np.trace(c1inv @ cov0)
        + diff @ c1inv @ diff
        - d
        + np.log(np.linalg.det(cov1) / np.linalg.det(cov0))
    )


def test_direct_update_closed_form():
    """Precision-space update: P' = P + s*Hneg, lin' = lin + s*(Hneg mu - gneg)."""
    model, meta = _setup(seed=1)
    rng = np.random.RandomState(2)
    k, d = 2, 3
    hneg = np.stack([_spd(rng, d, 0.1) for _ in range(model.max_components)])
    gneg = rng.randn(model.max_components, d).astype(np.float32) * 0.1
    s = np.asarray(meta.stepsizes)

    res = direct_update(model, meta, jnp.asarray(hneg), jnp.asarray(gneg),
                        meta.stepsizes)
    for i in range(k):
        cov = np.asarray(model.covs[i])
        prec = np.linalg.inv(cov)
        lin = prec @ np.asarray(model.means[i])
        new_prec = prec + s[i] * hneg[i]
        new_lin = lin + s[i] * (hneg[i] @ np.asarray(model.means[i]) - gneg[i])
        want_mean = np.linalg.solve(new_prec, new_lin)
        want_cov = np.linalg.inv(new_prec)
        np.testing.assert_allclose(
            np.asarray(res.model.means[i]), want_mean, rtol=2e-3, atol=2e-3
        )
        got_cov = np.asarray(res.model.covs[i])
        np.testing.assert_allclose(got_cov, want_cov, rtol=5e-3, atol=5e-3)
    # l2 regularizer halved-floored on success
    np.testing.assert_allclose(
        np.asarray(res.meta.l2_regularizers[:k]), 1e-12, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.meta.num_received_updates[:k]), 1.0
    )


def test_direct_update_rejects_indefinite():
    """A huge negative Hessian makes the new precision indefinite: keep old."""
    model, meta = _setup(seed=3)
    d = 3
    hneg = np.tile((-50.0 * np.eye(d, dtype=np.float32))[None],
                   (model.max_components, 1, 1))
    gneg = np.zeros((model.max_components, d), np.float32)
    res = direct_update(model, meta, jnp.asarray(hneg), jnp.asarray(gneg),
                        meta.stepsizes)
    np.testing.assert_allclose(
        np.asarray(res.model.means[:2]), np.asarray(model.means[:2])
    )
    np.testing.assert_allclose(
        np.asarray(res.model.chols[:2]), np.asarray(model.chols[:2])
    )
    # failed: l2 reg increased x10 (capped 1e-6)
    np.testing.assert_allclose(
        np.asarray(res.meta.l2_regularizers[:2]), 1e-11, rtol=1e-4
    )


def test_iblr_no_mean_update_on_first_iteration():
    model, meta = _setup(seed=4)
    rng = np.random.RandomState(5)
    d = 3
    hneg = np.stack([_spd(rng, d, 0.05) for _ in range(model.max_components)])
    gneg = rng.randn(model.max_components, d).astype(np.float32)
    res = iblr_update(model, meta, jnp.asarray(hneg), jnp.asarray(gneg),
                      meta.stepsizes)
    # first update: means unchanged, covariances updated
    np.testing.assert_allclose(
        np.asarray(res.model.means[:2]), np.asarray(model.means[:2])
    )
    assert not np.allclose(
        np.asarray(res.model.chols[:2]), np.asarray(model.chols[:2])
    )
    # second update moves the mean
    res2 = iblr_update(res.model, res.meta, jnp.asarray(hneg),
                       jnp.asarray(gneg), res.meta.stepsizes)
    assert not np.allclose(
        np.asarray(res2.model.means[:2]), np.asarray(res.model.means[:2])
    )


def test_trust_region_update_respects_kl_bound():
    model, meta = _setup(seed=6, stepsize=0.05)
    rng = np.random.RandomState(7)
    d = 3
    hneg = np.stack([_spd(rng, d, 0.3) for _ in range(model.max_components)])
    gneg = (rng.randn(model.max_components, d) * 2).astype(np.float32)
    res = trust_region_update(model, meta, jnp.asarray(hneg),
                              jnp.asarray(gneg), meta.stepsizes)
    eps = float(meta.stepsizes[0])
    moved = False
    for i in range(2):
        kl = gauss_kl(
            np.asarray(res.model.means[i]), np.asarray(res.model.covs[i]),
            np.asarray(model.means[i]), np.asarray(model.covs[i]),
        )
        # KL(new || old) must be within ~the bound (10% tolerance like the
        # reference's convergence criterion, plus slack for eta=max(.,T))
        assert kl < 1.6 * eps, f"component {i}: KL {kl} exceeds bound {eps}"
        if kl > 1e-6:
            moved = True
    assert moved
    # successful: etas recorded for warm start
    assert np.all(np.asarray(res.meta.last_etas[:2]) > 0)


def test_trust_region_warm_start_converges_again():
    model, meta = _setup(seed=8, stepsize=0.05)
    rng = np.random.RandomState(9)
    d = 3
    hneg = np.stack([_spd(rng, d, 0.3) for _ in range(model.max_components)])
    gneg = (rng.randn(model.max_components, d)).astype(np.float32)
    res = trust_region_update(model, meta, jnp.asarray(hneg),
                              jnp.asarray(gneg), meta.stepsizes)
    res2 = trust_region_update(res.model, res.meta, jnp.asarray(hneg),
                               jnp.asarray(gneg), res.meta.stepsizes)
    eps = float(meta.stepsizes[0])
    for i in range(2):
        kl = gauss_kl(
            np.asarray(res2.model.means[i]), np.asarray(res2.model.covs[i]),
            np.asarray(res.model.means[i]), np.asarray(res.model.covs[i]),
        )
        assert kl < 1.6 * eps


def test_trust_region_diagonal():
    model, meta = _setup(seed=10, stepsize=0.05, diagonal=True)
    rng = np.random.RandomState(11)
    d = 3
    hneg = rng.uniform(0.1, 0.5, (model.max_components, d)).astype(np.float32)
    gneg = rng.randn(model.max_components, d).astype(np.float32)
    res = trust_region_update(model, meta, jnp.asarray(hneg),
                              jnp.asarray(gneg), meta.stepsizes)
    eps = float(meta.stepsizes[0])
    for i in range(2):
        kl = gauss_kl(
            np.asarray(res.model.means[i]),
            np.diag(np.asarray(res.model.covs[i])),
            np.asarray(model.means[i]),
            np.diag(np.asarray(model.covs[i])),
        )
        assert np.isfinite(kl) and kl < 1.6 * eps


def test_updaters_leave_padding_slots_alone():
    model, meta = _setup(seed=12)
    rng = np.random.RandomState(13)
    d = 3
    hneg = np.stack([_spd(rng, d, 0.1) for _ in range(model.max_components)])
    gneg = rng.randn(model.max_components, d).astype(np.float32)
    for fn in (direct_update, iblr_update, trust_region_update):
        res = fn(model, meta, jnp.asarray(hneg), jnp.asarray(gneg),
                 meta.stepsizes)
        # padding chols stay identity, weights stay -inf
        np.testing.assert_allclose(
            np.asarray(res.model.chols[2:]),
            np.tile(np.eye(d)[None], (2, 1, 1)),
        )
        assert np.all(np.asarray(res.model.log_weights[2:]) == -np.inf)


def test_bracket_eigen_matches_cholesky_search():
    """The spectral KL (tpu.trust_region_search: bracket-eigen) visits the
    same bisection sequence and produces the same update as the Cholesky KL."""
    import jax.numpy as jnp
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.models import meta as M
    from gmmvi_tpu.optimization.component_updaters import trust_region_update

    rng = np.random.RandomState(3)
    k, d = 5, 4
    means = rng.randn(k, d).astype(np.float32)
    a = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", a, a) + np.eye(d, dtype=np.float32)
    state = G.create_gmm_state(np.full(k, 1.0 / k, np.float32), means, covs,
                               max_components=k)
    meta = M.create_meta_state(state, 0.5, 1e-12, 2)
    hneg = np.einsum("kij,klj->kil", a * 0.5, a * 0.5) + \
        0.1 * np.eye(d, dtype=np.float32)
    gneg = (rng.randn(k, d) * 0.2).astype(np.float32)

    out1 = trust_region_update(state, meta, jnp.asarray(hneg),
                               jnp.asarray(gneg), meta.stepsizes,
                               search="bracket")
    out2 = trust_region_update(state, meta, jnp.asarray(hneg),
                               jnp.asarray(gneg), meta.stepsizes,
                               search="bracket-eigen")
    np.testing.assert_allclose(np.asarray(out1[0].means),
                               np.asarray(out2[0].means), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1[0].chols),
                               np.asarray(out2[0].chols), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1[1].last_etas),
                               np.asarray(out2[1].last_etas), rtol=1e-3)


def test_chol_pair_from_prec_identity():
    """The exchange-identity factorization returns exactly the lower
    Cholesky of inv(P) and its exact triangular inverse."""
    from gmmvi_tpu.optimization.component_updaters import _chol_pair_from_prec

    rng = np.random.RandomState(3)
    k, d = 5, 17
    a = rng.randn(k, d, d).astype(np.float32)
    prec = np.einsum("kij,klj->kil", a, a) + d * np.eye(d, dtype=np.float32)

    chol, inv_chol = _chol_pair_from_prec(jnp.asarray(prec))
    chol, inv_chol = np.asarray(chol), np.asarray(inv_chol)

    # lower triangular with positive diagonal
    for m in (chol, inv_chol):
        assert np.allclose(m, np.tril(m))
        assert (np.diagonal(m, axis1=-2, axis2=-1) > 0).all()

    # chol @ chol^T == inv(prec), matching np.linalg.cholesky of the inverse
    ref = np.linalg.cholesky(np.linalg.inv(prec.astype(np.float64)))
    np.testing.assert_allclose(chol, ref, rtol=2e-3, atol=1e-6)
    # the returned inverse really is the factor's inverse
    eye = np.einsum("kij,kjl->kil", chol, inv_chol)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(d), eye.shape),
                               atol=5e-5)

    # non-SPD input -> NaNs in both outputs (the rejection signal)
    bad = prec.copy()
    bad[0] -= 3 * d * np.eye(d, dtype=np.float32)
    cb, ib = _chol_pair_from_prec(jnp.asarray(bad))
    assert np.isnan(np.asarray(cb)[0]).any()
    assert np.isnan(np.asarray(ib)[0]).any()
    assert not np.isnan(np.asarray(cb)[1:]).any()


def test_trust_region_newton_respects_kl_bound():
    """Newton search mode: the accepted eta satisfies the same trust-region
    contract as the bisection (|KL - eps| < 0.1 eps, or the conservative
    width-stop fallback), at both small and fast-tril-path dimensions."""
    for d in (3, 80):
        model, meta = _setup(d=d, seed=6, stepsize=0.05)
        rng = np.random.RandomState(7)
        hneg = np.stack([_spd(rng, d, 0.3 / d)
                         for _ in range(model.max_components)])
        gneg = (rng.randn(model.max_components, d) * 0.5).astype(np.float32)
        res = trust_region_update(model, meta, jnp.asarray(hneg),
                                  jnp.asarray(gneg), meta.stepsizes,
                                  search="newton")
        eps = float(meta.stepsizes[0])
        def kl_slogdet(m0, c0, m1, c1):
            # gauss_kl via slogdet (plain det overflows past d ~ 50)
            dd = len(m0)
            c1inv = np.linalg.inv(c1)
            diff = m1 - m0
            return 0.5 * (
                np.trace(c1inv @ c0) + diff @ c1inv @ diff - dd
                + np.linalg.slogdet(c1)[1] - np.linalg.slogdet(c0)[1])

        moved = False
        for i in range(2):
            if float(res.meta.last_etas[i]) < 0:
                continue  # rejected update keeps old params
            kl = kl_slogdet(
                np.asarray(res.model.means[i], np.float64),
                np.asarray(res.model.covs[i], np.float64),
                np.asarray(model.means[i], np.float64),
                np.asarray(model.covs[i], np.float64),
            )
            assert kl < 1.6 * eps, f"d={d} comp {i}: KL {kl} > bound {eps}"
            if kl > 1e-6:
                moved = True
        assert moved


def test_trust_region_newton_warm_start():
    """A second newton update from the recorded etas still succeeds and
    stays within the bound (the warm path initializes at last_eta)."""
    model, meta = _setup(seed=11, stepsize=0.05)
    rng = np.random.RandomState(13)
    d = 3
    hneg = np.stack([_spd(rng, d, 0.3) for _ in range(model.max_components)])
    gneg = (rng.randn(model.max_components, d)).astype(np.float32)
    res1 = trust_region_update(model, meta, jnp.asarray(hneg),
                               jnp.asarray(gneg), meta.stepsizes,
                               search="newton")
    assert np.all(np.asarray(res1.meta.last_etas[:2]) > 0)
    res2 = trust_region_update(res1.model, res1.meta, jnp.asarray(hneg),
                               jnp.asarray(gneg), res1.meta.stepsizes,
                               search="newton")
    eps = float(res1.meta.stepsizes[0])
    for i in range(2):
        if float(res2.meta.last_etas[i]) < 0:
            continue
        kl = gauss_kl(
            np.asarray(res2.model.means[i]), np.asarray(res2.model.covs[i]),
            np.asarray(res1.model.means[i]), np.asarray(res1.model.covs[i]),
        )
        assert kl < 1.6 * eps
