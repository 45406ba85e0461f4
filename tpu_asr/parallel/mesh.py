"""Device mesh + sharding rules: SPMD data parallelism over ICI.

The reference has NO distributed layer (SURVEY.md section 2.3: single
process, at most intra-node DataParallel). This module is its first-class
TPU replacement: a `jax.sharding.Mesh` with a 'data' axis (and an optional
'model' axis for tensor parallelism of the FFN/attention weights — cheap to
express, off by default for this model size). The jitted train step takes
batch arrays sharded along 'data' and replicated params; XLA GSPMD inserts
the gradient psum over ICI. Multi-host extends the same mesh via
jax.distributed.initialize (same code path).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Multi-host bring-up: call once per process before make_mesh.

    Wraps jax.distributed.initialize (coordinator/process env vars per the
    standard JAX multi-host convention). Safe no-op on a single host with
    no COORDINATOR_ADDRESS set.
    """
    import os
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("PROCESS_ID", "0")))


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded along 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, sharded along 'data'."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def make_global_batch(batch: dict, mesh: Mesh) -> dict:
    """Host-replicated numpy batch -> GLOBAL jax.Arrays for multi-host.

    jit rejects numpy inputs against a cross-process sharding; every
    process holds the SAME full batch (the loaders are seed-deterministic,
    so each host assembles an identical batch), and each contributes only
    its addressable shards here. Single-process meshes keep the plain
    numpy fast path (Solver only calls this when process_count() > 1).
    """
    s = batch_sharding(mesh)
    def conv(v):
        v = np.asarray(v)
        return jax.make_array_from_callback(v.shape, s,
                                            lambda idx: v[idx])
    return {k: conv(v) for k, v in batch.items()}
