"""Static analysis of the sharded training step's collective structure.

VERDICT r1 item 10: show that the only cross-device traffic in the
data-parallel step is the per-component moment reductions ([K, D] /
[K, D, D] psums) and global-normalizer scalars — i.e. the collectives
ride ICI comfortably and nothing accidentally all-gathers the sample
batch.

Compiles the FULL donated training step at the flagship shape
(SAMTRON, D=20, Kmax=48, n_des=200) over an 8-device mesh and parses the
optimized HLO for collective ops, reporting each op's payload shape and
bytes.  The optimized HLO's collective structure is backend-portable
(XLA SPMD partitioning runs before backend lowering), so the virtual CPU
mesh faithfully shows what a TPU pod would communicate per step.

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        PYTHONPATH= python scripts/analyze_collectives.py
"""
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


_SHAPE_RE = re.compile(r"(f32|f64|s32|u32|pred|bf16)\[([0-9,]*)\]")
_DTYPE_BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1, "bf16": 2}


def _payload_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def main():
    n_dev = len(jax.devices())
    if n_dev < 8:
        raise SystemExit(
            "need 8 virtual devices: run with "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
            "JAX_PLATFORMS=cpu PYTHONPATH="
        )
    from __graft_entry__ import _build_gmmvi

    hybrid = "--hybrid" in sys.argv
    sharded_db = "--sharded-db" in sys.argv
    if hybrid:
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                    ("data", "comp"))
    else:
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    tpu_extra = {"db_layout": "sharded" if sharded_db else "global"}
    g = _build_gmmvi(num_dimensions=20, n_des=200, kmax=48, k0=45, mesh=mesh,
                     tpu_extra=tpu_extra)
    # _spmd_scoped sets the kernel gate/mesh during tracing exactly like
    # train_iter does — without it the Pallas kernels trace unwrapped
    compiled = jax.jit(g._spmd_scoped(g._full_step),
                       donate_argnums=0).lower(g.state).compile()
    hlo = compiled.as_text()

    kinds = ("all-reduce", "all-gather", "reduce-scatter",
             "collective-permute", "all-to-all")
    found = []
    for line in hlo.splitlines():
        s = line.strip()
        op = s.split(" = ")[0] if " = " in s else s
        body = s.split(" = ")[1] if " = " in s else s
        for kind in kinds:
            # match op invocations, not computation applications
            if re.match(rf"(\(|\w|\.)*.* = .*{kind}(\.[0-9]+)?\(", s) or \
               body.startswith(kind):
                head = body.split("(")[0]
                shape_txt = head[len(head.split(kind)[0]):]
                # payload shapes sit between '=' and the op name
                payload = s.split(" = ")[1].split(kind)[0] if kind in body \
                    else ""
                m = re.search(r'op_name="([^"]*)"', s)
                src = re.search(r'source_file="([^"]*)".*source_line=(\d+)',
                                s)
                where = (m.group(1)[-110:] if m else "?")
                if src:
                    where += f"  [{os.path.basename(src.group(1))}:"\
                             f"{src.group(2)}]"
                found.append((kind, op, payload.strip(),
                              _payload_bytes(payload), where))
                break

    mesh_desc = ("4x2 ('data', 'comp') axes" if hybrid
                 else "8-device 1-D 'data' axis")
    print(f"mesh: {mesh_desc}; flagship shape "
          f"(D=20, Kmax=48, n_des=200, window 9600)\n")
    if not found:
        print("no collectives found (?) — inspect the HLO manually")
        return
    total = 0
    by_kind = {}
    for kind, op, payload, nbytes, where in found:
        total += nbytes
        by_kind.setdefault(kind, [0, 0])
        by_kind[kind][0] += 1
        by_kind[kind][1] += nbytes
        print(f"{kind:20s} {nbytes:>10,d} B   {payload[:60]:60s} {where}")
    print("\nsummary:")
    for kind, (cnt, nbytes) in sorted(by_kind.items()):
        print(f"  {kind:20s} x{cnt:<3d} {nbytes:>12,d} B")
    print(f"  total collective payload per step: {total:,d} B")

    # the sample batch itself must never be gathered: [9600, 20] f32
    batch_bytes = 9600 * 20 * 4
    gathered = [f for f in found if f[3] >= batch_bytes]
    if gathered:
        print("\nWARNING: collective(s) at or above the sample-batch size — "
              "the batch may be getting gathered:")
        for kind, op, payload, nbytes, where in gathered:
            print(f"  {kind} {nbytes:,d} B {payload[:60]} {where}")
    else:
        print("\nOK: no collective reaches the sample-batch size "
              f"({batch_bytes:,d} B) — the batch stays sharded.")


if __name__ == "__main__":
    main()
