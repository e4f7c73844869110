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
