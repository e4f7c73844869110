"""Microbench: blocked XLA Cholesky / triangular inverse vs the stock
primitives at the stm300 trust-region shape, plus the full whitened
bisection trip both ways.

Measured two ways:
* scan-chained with FULL-tensor feedback (``x + 1e-12 * y``): dependent
  calls inside one dispatch; consuming all of ``y`` prevents the slice-DCE
  that makes partially-consumed factorizations look ~400x faster than their
  memory floor;
* r4-style pipelined dispatch (independent calls, one block at the end) —
  the methodology behind RESULTS_r04's 4.66 ms stock-cholesky number.

Run: python scripts/bench_blocked_linalg.py [--k 40] [--d 300]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmvi_tpu.ops.blocked_linalg import (
    blocked_cholesky, blocked_tril_inverse, fast_tril_inverse)

_PREC = jax.lax.Precision.HIGHEST


def chain(fn, x0, n=16):
    """Scan-chain n dependent applications; every output element feeds back."""
    def body(x, _):
        y = fn(x)
        return x + 1e-12 * y, None

    f = jax.jit(lambda x: jax.lax.scan(body, x, None, length=n)[0])
    f(x0).block_until_ready()
    t0 = time.perf_counter()
    f(x0).block_until_ready()
    t1 = time.perf_counter()
    return (t1 - t0) / n * 1e3


def pipelined(fn, x0, n=16):
    """Independent dispatches, single block at the end (r4 methodology)."""
    f = jax.jit(fn)
    f(x0).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(x0) for _ in range(n)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=40)
    p.add_argument("--d", type=int, default=300)
    p.add_argument("--n", type=int, default=16)
    args = p.parse_args()
    k, d, n = args.k, args.d, args.n

    rng = np.random.default_rng(0)
    a = rng.standard_normal((k, d, d)).astype(np.float32)
    spd = jnp.asarray(a @ np.swapaxes(a, -1, -2) + d * np.eye(d, dtype=np.float32))
    l0 = jnp.linalg.cholesky(spd)

    flops = k * d**3 / 3
    print(f"[{k}, {d}, {d}] f32, backend={jax.default_backend()}")
    print(f"{'':24s}  chained      pipelined")

    def both(label, fn, x0):
        tc = chain(fn, x0, n)
        tp = pipelined(fn, x0, n)
        print(f"{label:24s}: {tc:8.3f} ms  {tp:8.3f} ms"
              f"  ({flops/tc/1e9:6.2f} TF/s chained)")

    both("stock cholesky", lambda x: jnp.linalg.cholesky(x), spd)
    for b in (64, 128, 160):
        both(f"blocked cholesky B={b}",
             lambda x, b=b: blocked_cholesky(x, block=b), spd)

    eye = jnp.broadcast_to(jnp.eye(d, dtype=jnp.float32), (k, d, d))
    both("stock tri inverse",
         lambda x: jax.lax.linalg.triangular_solve(
             x, eye, left_side=True, lower=True), l0)
    for b in (64, 128, 160):
        both(f"blocked tri inv B={b}",
             lambda x, b=b: blocked_tril_inverse(x, block=b), l0)
    both("fast tri inv (matmul)", lambda x: fast_tril_inverse(x), l0)

    # full whitened bisection trip, both ways (see component_updaters.py
    # _tr_kl_whitened_trip): chol(S) + trace(S^-1) + z-solve + norms.
    # eta: [K] per-component scalars.
    m_w = spd / d
    c = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
    eyed = jnp.eye(d, dtype=jnp.float32)

    def trip(eta, chol_fn, inv_fn):
        s = m_w / eta[:, None, None] + eyed
        lc = chol_fn(s)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(lc, axis1=-2, axis2=-1)), -1)
        inv_lc = inv_fn(lc)
        trace = jnp.sum(jnp.square(inv_lc), (-2, -1))
        rhs = c + b1 / eta[:, None]
        z = jnp.einsum("kji,kj->ki", inv_lc,
                       jnp.einsum("kij,kj->ki", inv_lc, rhs, precision=_PREC),
                       precision=_PREC)
        return 0.5 * (logdet + trace - d + jnp.sum(jnp.square(c - z), -1))

    stock_inv = lambda lc: jax.lax.linalg.triangular_solve(
        lc, jnp.broadcast_to(eyed, lc.shape), left_side=True, lower=True)

    def chain_trip(fn, label):
        def body(eta, _):
            return eta + 1e-12 * fn(eta), None
        f = jax.jit(lambda e: jax.lax.scan(body, e, None, length=n)[0])
        e0 = jnp.full((k,), 5.0)
        f(e0).block_until_ready()
        t0 = time.perf_counter()
        f(e0).block_until_ready()
        tc = (time.perf_counter() - t0) / n * 1e3
        print(f"{label:24s}: {tc:8.3f} ms  (chained)")
        return tc

    chain_trip(lambda e: trip(e, jnp.linalg.cholesky, stock_inv),
               "whitened trip stock")
    chain_trip(lambda e: trip(e, jnp.linalg.cholesky, fast_tril_inverse),
               "whitened trip fast-inv")

    kl_a = trip(jnp.full((k,), 5.0), jnp.linalg.cholesky, stock_inv)
    kl_b = trip(jnp.full((k,), 5.0), jnp.linalg.cholesky, fast_tril_inverse)
    print("trip KL max rel diff  :",
          float(jnp.max(jnp.abs(kl_a - kl_b) / (jnp.abs(kl_a) + 1e-12))))


if __name__ == "__main__":
    main()
