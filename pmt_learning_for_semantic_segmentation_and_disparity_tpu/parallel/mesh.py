"""Device mesh construction and data-parallel shardings.

TPU-native replacement for the reference's NCCL process-group plumbing
(torch_implementation.py:621-630: mp.spawn per GPU, env:// rendezvous,
DistributedSampler, DDP wrap). Under SPMD there is one program: we build a
``jax.sharding.Mesh`` over all devices, shard the batch over the ``data``
axis, and let XLA insert the gradient psum over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def setup_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host entry: ``jax.distributed.initialize`` when a coordinator
    is configured (args or PMT_COORDINATOR / PMT_NUM_PROCESSES /
    PMT_PROCESS_ID env vars, which also fall back to jax's own cluster
    autodetection on TPU pods). No-op on single host. Returns whether a
    multi-process runtime is active.

    The reference's analogue is the env:// NCCL rendezvous
    (torch_implementation.py:627-630); here every host runs the SAME SPMD
    program over the global mesh and only loads its own batch shard
    (data/pipeline.py).
    """
    import os

    coordinator = coordinator or os.environ.get("PMT_COORDINATOR")
    if num_processes is None and os.environ.get("PMT_NUM_PROCESSES"):
        num_processes = int(os.environ["PMT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("PMT_PROCESS_ID"):
        process_id = int(os.environ["PMT_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 1-D (or trivially reshaped N-D) mesh over visible devices.

    The reference is data-parallel only (SURVEY.md §2.5); the mesh therefore
    defaults to a single ``data`` axis. Extra axes (e.g. a ``space`` axis for
    spatially-sharded high-res eval) fold in with size 1 unless reshaped by
    the caller.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    dev = np.asarray(devices)
    shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(dev.reshape(shape), axis_names=tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch (pytree of arrays) sharded on dim 0."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-parallel size {n}"
        )
    return global_batch // n
