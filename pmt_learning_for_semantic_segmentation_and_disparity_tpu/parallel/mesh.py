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
