"""Device mesh + sharding rules.

The reference's entire distributed story is single-node DDP over NCCL with
gradient all-reduce hidden inside backward
(/root/reference/vits2/train.py:44-69,219-222). The TPU-native equivalent is
one mesh abstraction:

- a 1-D `data` axis over all chips (ICI within a slice, DCN across slices);
- batches sharded over `data`, parameters replicated;
- gradient reduction appears automatically as psum when the jitted train step
  consumes a sharded batch and produces replicated parameter updates (GSPMD
  inserts the collectives — nothing like a process-group API is needed).

Model parallelism axes (tp/pp) are deliberately absent for these ~40M-param
models (SURVEY.md §2.5): parameters fit on one chip with room to spare, so
replication + data sharding is the speed-of-light layout. The mesh helper
still accepts extra axes for forward-compatibility.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """1-D data-parallel mesh over the first n_data devices (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is not None:
        devices = devices[:n_data]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array in the batch pytree with its batch axis sharded.

    Single-process: a plain device_put with the sharded layout (the input is
    the global batch). Multi-process: each process holds only its own
    rank-sliced batch (DistributedBucketSampler feeds different data per
    rank), so the local arrays must be ASSEMBLED into a global
    [B * process_count] array — device_put would instead interpret each
    host's local batch as the global one and silently drop/diverge data.
    `jax.make_array_from_process_local_data` does the assembly: the global
    shape is inferred as local_shape scaled by the sharding's cross-process
    partitioning over the batch axis.
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (parameters, optimizer state) over the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (multi-slice / DCN) initialization.

    The reference's analogue is the env-var NCCL rendezvous
    (MASTER_ADDR/MASTER_PORT + init_process_group, vits2/train.py:44-69).
    On TPU pods `jax.distributed.initialize()` discovers everything from the
    environment; arguments are only needed off-TPU. After this, jax.devices()
    spans all hosts and the same `make_mesh()` + sharded-batch training code
    runs unchanged — gradient psums ride ICI within a slice and DCN across
    slices.

    Each host must feed its own batch shard (use DistributedBucketSampler
    with num_replicas=jax.process_count(), rank=jax.process_index()).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
