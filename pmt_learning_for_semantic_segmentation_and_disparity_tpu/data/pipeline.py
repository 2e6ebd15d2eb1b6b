"""Input pipeline: threaded host-side loading + sharded device prefetch.

TPU-native replacement for torch DataLoader + DistributedSampler
(torch_implementation.py:772-790): one host process feeds the whole mesh;
batches are device_put with the batch dim sharded over the 'data' axis, with
a double-buffer so host loading overlaps device compute.
"""
from __future__ import annotations

import collections
import concurrent.futures as futures
import itertools
import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import jax
import numpy as np

from ..parallel.mesh import batch_sharding


def _stack(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = [k for k in samples[0] if k != "meta"]
    out = {k: np.stack([s[k] for s in samples]) for k in keys}
    out["meta"] = [s.get("meta") for s in samples]
    return out


def pad_to_bucket(batch: Dict[str, np.ndarray], bucket_hw) -> Dict[str, np.ndarray]:
    """Pad spatial dims up to a static eval bucket (XLA needs fixed shapes;
    the reference's 'crop [0,0] = full image' path is dynamic).

    Adds a ``pad_mask`` (B,bh,bw,1) float map — 1 on real pixels, 0 on the
    padded border — which the eval metrics use to exclude padding from the
    report (the reference evaluates at native size, so padding must be
    metrically invisible)."""
    bh, bw = bucket_hw
    out = {}
    mask = None
    for k, v in batch.items():
        if k == "meta" or not isinstance(v, np.ndarray) or v.ndim != 4:
            out[k] = v
            continue
        _, h, w, _ = v.shape
        if h > bh or w > bw:
            v = v[:, :bh, :bw]
            h, w = v.shape[1:3]
        if mask is None:
            mask = np.zeros((v.shape[0], bh, bw, 1), np.float32)
            mask[:, :h, :w] = 1.0
        if (h, w) != (bh, bw):
            v = np.pad(v, ((0, 0), (0, bh - h), (0, bw - w), (0, 0)))
        out[k] = v
    if mask is not None:
        out["pad_mask"] = mask
    return out


class DataLoader:
    """Minimal epoch-based loader: shuffling, worker threads, drop_last."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        bucket_hw=None,
        pad_batch: bool = False,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.bucket_hw = bucket_hw
        # pad_batch: repeat the last sample so every batch has batch_size
        # rows (needed when the batch shards over a mesh); 'valid' in the
        # batch dict records the true count.
        self.pad_batch = pad_batch
        # multi-host: batch_size is the GLOBAL batch; every host draws the
        # same (seed-synchronized) index permutation but loads ONLY its
        # contiguous 1/process_count slice of each batch — the per-host
        # DistributedSampler analogue (torch_implementation.py:772-790)
        # without ever materializing the global batch on one host.
        if batch_size % max(1, process_count):
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{process_count} processes")
        self.process_index = process_index
        self.process_count = max(1, process_count)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        # re-seed the per-sample augmentation stream like DistributedSampler
        # set_epoch does (torch_implementation.py:884)
        if hasattr(self.dataset, "seed"):
            self.dataset.seed = self.seed + epoch

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        local = self.batch_size // self.process_count
        with futures.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, n, self.batch_size):
                chunk = idx[start : start + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last:
                    break
                valid = len(chunk)
                if self.pad_batch and valid < self.batch_size:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:],
                                          self.batch_size - valid)]
                    )
                # this host's contiguous slice of the global batch
                chunk = chunk[self.process_index * local:
                              (self.process_index + 1) * local]
                samples = list(pool.map(self.dataset.__getitem__, chunk))
                batch = _stack(samples)
                if self.bucket_hw is not None:
                    batch = pad_to_bucket(batch, self.bucket_hw)
                batch["valid"] = valid
                yield batch


def prefetch_to_mesh(iterator, mesh, size: int = 2):
    """Double-buffered sharded device prefetch. Drops 'meta' (host-only).

    Multi-host: each host feeds only its local shard of the global batch
    (the loader yields batch/process_count rows);
    ``make_array_from_process_local_data`` assembles the global array."""
    sharding = batch_sharding(mesh)
    multi = jax.process_count() > 1
    buf = collections.deque()

    def put(b):
        meta = {"meta": b.pop("meta", None), "valid": b.pop("valid", None)}
        if multi:
            dev = {
                k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in b.items()
                if isinstance(v, np.ndarray)
            }
        else:
            dev = {
                k: jax.device_put(v, sharding)
                for k, v in b.items()
                if isinstance(v, np.ndarray)
            }
        return dev, meta

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(dict(next(it))))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(dict(next(it))))
        except StopIteration:
            pass
        yield out
