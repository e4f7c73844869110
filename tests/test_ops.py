"""Stable reductions and quadratic regression."""
import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.ops.stable import (
    masked_logsumexp,
    masked_softmax,
    signed_weighted_logsumexp,
)
from gmmvi_tpu.ops.quadratic import fit_quadratic, quadratic_features


def test_masked_logsumexp():
    a = jnp.asarray([[1.0, 2.0, 3.0], [0.0, -1.0, 5.0]])
    mask = jnp.asarray([[True, True, False], [True, True, True]])
    got = np.asarray(masked_logsumexp(a, mask=mask, axis=1))
    want0 = np.log(np.exp(1) + np.exp(2))
    want1 = np.log(np.exp(0) + np.exp(-1) + np.exp(5))
    np.testing.assert_allclose(got, [want0, want1], rtol=1e-6)

    # fully-masked row -> -inf
    mask2 = jnp.asarray([[False, False, False], [True, True, True]])
    got2 = np.asarray(masked_logsumexp(a, mask=mask2, axis=1))
    assert got2[0] == -np.inf and np.isfinite(got2[1])


def test_signed_weighted_logsumexp_matches_direct():
    rng = np.random.RandomState(0)
    log_w = rng.randn(50).astype(np.float32)
    vals = rng.randn(50, 4).astype(np.float32) * 10
    got = np.asarray(
        signed_weighted_logsumexp(
            jnp.asarray(log_w)[:, None], jnp.asarray(vals), axis=0
        )
    )
    want = np.sum(np.exp(log_w)[:, None] * vals, axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_signed_weighted_logsumexp_masked():
    log_w = jnp.zeros((4, 1))
    vals = jnp.asarray([[1.0], [2.0], [-3.0], [100.0]])
    mask = jnp.asarray([[True], [True], [True], [False]])
    got = float(signed_weighted_logsumexp(log_w, vals, axis=0, mask=mask)[0])
    np.testing.assert_allclose(got, 0.0, atol=1e-5)


def test_masked_softmax():
    logits = jnp.asarray([1.0, 2.0, 3.0])
    mask = jnp.asarray([True, False, True])
    p = np.asarray(masked_softmax(logits, mask=mask, axis=0))
    assert p[1] == 0
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)


def test_quadratic_features_ordering():
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    f = np.asarray(quadratic_features(x))[0]
    # upper triangle row-major: x0x0, x0x1, x0x2, x1x1, x1x2, x2x2, then x, 1
    np.testing.assert_allclose(f, [1, 2, 3, 4, 6, 9, 1, 2, 3, 1], rtol=1e-6)


def test_fit_quadratic_recovers_exact_quadratic():
    """Noise-free quadratic data -> exact recovery of (quad, lin, const)."""
    rng = np.random.RandomState(1)
    d, n = 3, 200
    a = rng.randn(d, d)
    q_true = -(a.T @ a)  # note: fit returns quad = -(qt+qt^T) convention
    r_true = rng.randn(d)
    c_true = 0.7
    x = rng.randn(n, d).astype(np.float32) * 2

    # target convention from the reference (least_squares.py:177-181):
    # outputs = x^T qt x + x^T r + c with quad_term = -(qt + qt^T).
    qt = -0.5 * q_true  # symmetric: qt + qt^T = -q_true
    y = np.einsum("ni,ij,nj->n", x, qt, x) + x @ r_true + c_true

    mean = np.zeros(d, np.float32)
    inv_chol = np.eye(d, dtype=np.float32)
    quad, lin, const = fit_quadratic(
        jnp.asarray(1e-10),
        jnp.asarray(x),
        jnp.asarray(y.astype(np.float32)),
        jnp.ones(n),
        jnp.asarray(mean),
        jnp.asarray(inv_chol),
    )
    np.testing.assert_allclose(np.asarray(quad), q_true, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(lin), r_true, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(float(const), c_true, rtol=1e-2, atol=5e-2)


def test_fit_quadratic_whitening_invariance():
    """Whitened fit must agree with unwhitened fit on exact data."""
    rng = np.random.RandomState(2)
    d, n = 2, 100
    x = (rng.randn(n, d) * np.array([3.0, 0.5]) + np.array([5.0, -2.0])).astype(
        np.float32
    )
    qt = np.array([[1.0, 0.3], [0.0, 2.0]], np.float32)
    r = np.array([0.5, -1.0], np.float32)
    y = np.einsum("ni,ij,nj->n", x, qt, x) + x @ r + 0.1

    mean = x.mean(0)
    cov = np.cov(x.T) + 1e-6 * np.eye(d)
    chol = np.linalg.cholesky(cov)
    inv_chol = np.linalg.inv(chol).astype(np.float32)

    quad, lin, const = fit_quadratic(
        jnp.asarray(1e-9), jnp.asarray(x), jnp.asarray(y.astype(np.float32)),
        jnp.ones(n), jnp.asarray(mean), jnp.asarray(inv_chol),
    )
    want_quad = -(qt + qt.T)
    np.testing.assert_allclose(np.asarray(quad), want_quad, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(lin), r, rtol=1e-2, atol=2e-2)


def test_fit_quadratic_masked_matches_subset():
    rng = np.random.RandomState(3)
    d, n = 2, 60
    x = rng.randn(n, d).astype(np.float32)
    y = rng.randn(n).astype(np.float32)
    w = rng.uniform(0.5, 1.0, n).astype(np.float32)
    mask = np.arange(n) < 40

    full = fit_quadratic(
        jnp.asarray(1e-6), jnp.asarray(x[:40]), jnp.asarray(y[:40]),
        jnp.asarray(w[:40]), jnp.zeros(d), jnp.eye(d),
    )
    masked = fit_quadratic(
        jnp.asarray(1e-6), jnp.asarray(x), jnp.asarray(y), jnp.asarray(w),
        jnp.zeros(d), jnp.eye(d), mask=jnp.asarray(mask),
    )
    for a, b in zip(full, masked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
