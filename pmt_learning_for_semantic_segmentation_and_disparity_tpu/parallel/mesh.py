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
REPLICA_AXIS = "replica"


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
    mesh_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a 1-D (or hierarchical multi-slice) mesh over visible devices.

    The reference is data-parallel only (SURVEY.md §2.5); the mesh therefore
    defaults to a single ``data`` axis. ``mesh_shape=(n_slices,
    devs_per_slice)`` builds a hierarchical ('replica', 'data') mesh for
    multi-slice pods: the inner ``data`` axis maps to ICI-connected devices
    within a slice, the outer ``replica`` axis to the DCN links between
    slices. On real multi-slice hardware the device grid is arranged by
    ``slice_index`` so each ``data`` row stays intra-slice; on emulated
    meshes it is a plain row-major reshape.
    """
    if devices is None:
        devices = jax.devices()
    if mesh_shape is not None and len(mesh_shape) == 2:
        n_rep, n_data = mesh_shape
        need = n_rep * n_data
        devices = list(devices)
        if len(devices) < need:
            raise ValueError(
                f"mesh_shape {tuple(mesh_shape)} needs {need} devices, "
                f"have {len(devices)}")
        # group by slice when the platform exposes slice_index (multi-slice
        # TPU); emulated CPU devices all report the same slice.
        devices = sorted(
            devices[:need] if len({getattr(d, "slice_index", 0)
                                   for d in devices}) <= 1 else devices,
            key=lambda d: (getattr(d, "slice_index", 0), d.id),
        )[:need]
        dev = np.asarray(devices).reshape(n_rep, n_data)
        return Mesh(dev, axis_names=(REPLICA_AXIS, DATA_AXIS))
    if n_devices is not None:
        devices = devices[:n_devices]
    dev = np.asarray(devices)
    shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(dev.reshape(shape), axis_names=tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over every mesh axis (replica-major on
    hierarchical meshes); replicate the rest."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch (pytree of arrays) sharded on dim 0."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def mesh_size(mesh: Mesh) -> int:
    """Total data-parallel width (product of all mesh axes)."""
    n = 1
    for v in mesh.shape.values():
        n *= v
    return n


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh_size(mesh)
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-parallel size {n}"
        )
    return global_batch // n
