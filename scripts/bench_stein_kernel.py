"""Microbench: streamed Stein second-moment kernel vs the XLA einsum at the
SAMTRON stm300 estimator shape (K_pad=40, N=12032, D=300).

Scan-chained dependent calls per the repo's measurement discipline
(TODO.md "Measurement discipline"): the feedback consumes EVERY output
element through an elementwise square before reducing — a plain sum over K
would let XLA's reduce-of-dot fold skip the per-component moments entirely.

Run: python scripts/bench_stein_kernel.py [--k 40] [--d 300] [--n 12032]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmvi_tpu.ops.pallas_stein import fused_stein_smom

_PREC = jax.lax.Precision.HIGHEST


def chain(fn, g0, w, xc, n_calls=16):
    """g -> s_mom -> g + 1e-12 * colsum(square(s_mom)): full consumption,
    square blocks algebraic reduce-of-dot folds."""

    def body(g, _):
        s = fn(w, g, xc)
        fb = jnp.sum(s * s, axis=(0, 1))                  # [D]
        return g + 1e-12 * fb[None, :], None

    f = jax.jit(lambda g: jax.lax.scan(body, g, None, length=n_calls)[0])
    f(g0).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(g0).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n_calls * 1e3)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=40)
    p.add_argument("--d", type=int, default=300)
    p.add_argument("--n", type=int, default=12032)
    p.add_argument("--calls", type=int, default=16)
    args = p.parse_args()
    k, d, n = args.k, args.d, args.n

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.rand(k, n).astype(np.float32) / n)
    g = jnp.asarray(rng.randn(n, d).astype(np.float32))
    xc = jnp.asarray(rng.randn(n, d).astype(np.float32))

    gflop = 2.0 * k * n * d * d / 1e9
    print(f"shape K={k} N={n} D={d}: {gflop:.1f} GFLOP/call")

    def einsum_path(w_, g_, x_):
        return jnp.einsum("kn,nd,ne->kde", w_, g_, x_, precision=_PREC)

    for name, fn in (
        ("xla_einsum_highest", einsum_path),
        ("kernel_bf16x3", lambda w_, g_, x_: fused_stein_smom(
            w_, g_, x_, mm="bf16x3")),
        ("kernel_f32", lambda w_, g_, x_: fused_stein_smom(
            w_, g_, x_, mm="f32")),
    ):
        ms = chain(fn, g, w, xc, n_calls=args.calls)
        print(f"{name:22s} {ms:8.3f} ms/call   {gflop / ms:7.2f} TFLOP/s")


if __name__ == "__main__":
    main()
