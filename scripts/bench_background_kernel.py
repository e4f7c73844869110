"""Crossover measurement: streaming Pallas background kernel vs XLA chain.

Sweeps (U, N, D) shapes of the count-weighted background mixture
log-density (sample_db._background_logsumexp) and times both paths on the
attached device, scan-batched inside one dispatch so host latency doesn't
pollute sub-millisecond kernels.  The result drives the U-threshold gate in
sample_db._fused_background_mode.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gmmvi_tpu.ops.pallas_density import fused_background_logpdf
from gmmvi_tpu.ops.stable import masked_logsumexp

LOG_2PI = float(np.log(2.0 * np.pi))
ITERS = 30


def xla_background(means, inv_chols, log_w, log_dets, x):
    diffs = x[None] - means[:, None]                       # [U, N, D]
    y = jnp.einsum("uij,unj->uni", inv_chols, diffs,
                   precision=jax.lax.Precision.HIGHEST)
    lp = (-0.5 * jnp.sum(y * y, -1) - log_dets[:, None]
          - 0.5 * x.shape[1] * LOG_2PI)
    return masked_logsumexp(lp + log_w[:, None],
                            mask=jnp.isfinite(log_w)[:, None], axis=0)


def timeit(fn, args, iters=ITERS, reps=5):
    def step(carry, _):
        out = fn(*args)
        return carry + jnp.sum(out), None

    @jax.jit
    def run():
        acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
        return acc

    run().block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run().block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    for (u, d, n) in [(96, 20, 9600), (256, 20, 9600), (512, 20, 9600),
                      (1024, 20, 9600), (2048, 20, 9600),
                      (96, 20, 38400), (512, 20, 38400),
                      (512, 64, 9600), (1024, 64, 9600),
                      (256, 2, 9600), (1024, 2, 38400)]:
        means = jnp.asarray(rng.randn(u, d), jnp.float32)
        a = rng.randn(u, d, d).astype(np.float32) * 0.1
        covs = np.einsum("uij,ulj->uil", a, a) + np.eye(d, dtype=np.float32)
        chols = np.linalg.cholesky(covs)
        inv = jnp.asarray(np.linalg.inv(chols), jnp.float32)
        logdet = jnp.asarray(
            np.sum(np.log(np.diagonal(chols, axis1=-2, axis2=-1)), -1),
            jnp.float32)
        logw = jnp.asarray(np.log(np.ones(u) / u), jnp.float32)
        x = jnp.asarray(rng.randn(n, d) * 2, jnp.float32)
        args = (means, inv, logw, logdet, x)

        t_xla = timeit(xla_background, args)
        t_pl = timeit(functools.partial(fused_background_logpdf,
                                        interpret=False), args)
        got = fused_background_logpdf(*args)
        want = xla_background(*args)
        ok = bool(jnp.allclose(got, want, rtol=1e-4, atol=2e-4))
        print(f"U={u:5d} D={d:3d} N={n:6d}  xla {t_xla:7.3f} ms   "
              f"pallas {t_pl:7.3f} ms   speedup {t_xla / t_pl:5.2f}x  "
              f"match={ok}")


if __name__ == "__main__":
    main()
