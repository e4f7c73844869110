"""Device-mesh utilities for data-parallel GMMVI.

The workload's scaling axis is the per-iteration Monte-Carlo sample batch
(SURVEY.md §5): model and optimizer state are tiny ([K, D], [K, D, D]) and
stay replicated, the sample batch is sharded over a 1-D ``data`` mesh axis,
and every per-component sufficient statistic (E[grad], E[Hessian],
E[log-ratio], ESS normalizers) is a contraction over the sample axis that XLA
lowers to psum collectives over ICI (intra-slice) / DCN (multi-host).

Multi-host usage: call :func:`initialize_distributed` once per host, then
:func:`data_mesh` returns the global mesh; GMMVI / GmmviRunner accept it via
their ``mesh`` argument.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime for multi-host pods.

    On Cloud TPU pods the arguments are auto-detected; pass them explicitly in
    other environments.  No-op when already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D ``data`` mesh over (up to) ``num_devices`` global devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices).reshape(len(devices)), ("data",))


def hybrid_mesh(num_comp: int, num_devices: Optional[int] = None) -> Mesh:
    """2-D ``("data", "comp")`` mesh: samples shard over ``data``, the
    component axis of the model (and every per-component chain — trust-region
    bisections, Cholesky reconstructions, Stein moments) shards over ``comp``.

    Worth it for large-K adaptive runs (the reference's VIPS caps at
    max_components=1000, component_adaptation defaults): per-component
    compute is then the dominant cost and is embarrassingly parallel over
    K.  For small K keep the 1-D :func:`data_mesh` — a comp axis only adds
    collective latency.  Put ``comp`` innermost (fastest-varying on the
    physical topology) so its all-reduces ride the shortest ICI hops.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % num_comp:
        raise ValueError(f"{n} devices not divisible by num_comp={num_comp}")
    return Mesh(
        np.asarray(devices).reshape(n // num_comp, num_comp),
        ("data", "comp"),
    )


def mesh_from_config(tpu_cfg: dict) -> Optional[Mesh]:
    """Build a mesh from the config's ``tpu:`` section, or None.

    ``tpu.data_shards`` (int or "all") requests a 1-D ``data`` mesh;
    adding ``tpu.comp_shards: M`` requests the 2-D hybrid mesh with the
    component axis sharded M-way.  This makes multi-chip runs configurable
    from YAML — no programmatic mesh construction needed."""
    tpu_cfg = tpu_cfg or {}
    data = tpu_cfg.get("data_shards")
    comp = int(tpu_cfg.get("comp_shards", 1))
    if data is None and comp <= 1:
        return None
    n_avail = len(jax.devices())
    if data in (None, "all", -1):
        n = n_avail
    else:
        n = int(data) * comp
    if n > n_avail:
        raise ValueError(
            f"tpu mesh config requests {n} devices "
            f"(data_shards={data}, comp_shards={comp}) but only "
            f"{n_avail} are visible")
    if comp > 1:
        return hybrid_mesh(num_comp=comp, num_devices=n)
    return data_mesh(num_devices=n)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for a batch tensor: leading axis over ``data``, rest
    replicated."""
    return NamedSharding(
        mesh, PartitionSpec("data", *([None] * (ndim - 1)))
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
