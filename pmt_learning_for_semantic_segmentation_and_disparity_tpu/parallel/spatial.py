"""Spatial sharding for high-resolution inference.

The reference's honest 'sequence parallel' analogue is tiled whole-image
eval (divideNetOutput / slideWindowInfer, SURVEY.md §5). TPU-native design:
cut the image into overlapping horizontal bands, stack the bands into the
BATCH dimension and run the ordinary data-sharded forward — each device
processes its band(s) concurrently, XLA handles everything, no explicit
halo-exchange collectives are needed because the overlap is materialized
host-side (the same trick the reference's overlapping windows use, but in
one batched forward instead of a python loop).

For crops the model downsamples by /32, a halo of >= 32px keeps band
boundaries consistent with the monolithic forward up to the receptive-field
tail; we default to 64.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp


def split_bands(x: jnp.ndarray, n_bands: int, halo: int = 64):
    """(B,H,W,C) -> (B*n_bands, H/n + up-to-2*halo, W, C) plus slice info."""
    b, h, w, c = x.shape
    assert h % n_bands == 0, (h, n_bands)
    bh = h // n_bands
    bands = []
    meta = []
    for i in range(n_bands):
        top = max(0, i * bh - halo)
        bot = min(h, (i + 1) * bh + halo)
        pad_top = halo - (i * bh - top)
        pad_bot = halo - (bot - (i + 1) * bh)
        band = x[:, top:bot]
        if pad_top or pad_bot:
            band = jnp.pad(band, ((0, 0), (pad_top, pad_bot), (0, 0), (0, 0)))
        bands.append(band)
        meta.append((i * bh, bh))
    return jnp.concatenate(bands, axis=0), meta, (b, h, w)


def merge_bands(y: jnp.ndarray, meta, full_shape, halo: int = 64):
    """Inverse of split_bands for per-pixel outputs with the same H."""
    b, h, w = full_shape
    n_bands = len(meta)
    c = y.shape[-1]
    out = jnp.zeros((b, h, w, c), y.dtype)
    for i, (start, bh) in enumerate(meta):
        band = y[i * b : (i + 1) * b]
        out = out.at[:, start : start + bh].set(band[:, halo : halo + bh])
    return out


def spatial_shard_infer(
    apply_fn: Callable[[jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]],
    left: jnp.ndarray,
    right: jnp.ndarray,
    n_bands: int = 8,
    halo: int = 64,
) -> Dict[str, jnp.ndarray]:
    """Run a stereo forward with the image spatially sharded into bands that
    ride the existing 'data' batch axis. apply_fn must be batch-polymorphic
    (e.g. the jitted/shard_mapped eval forward)."""
    lb, meta, full = split_bands(left, n_bands, halo)
    rb, _, _ = split_bands(right, n_bands, halo)
    out = apply_fn(lb, rb)
    merged = {}
    for k, v in out.items():
        if v is None or v.ndim != 4 or v.shape[1] != lb.shape[1]:
            continue
        merged[k] = merge_bands(v, meta, full, halo)
    return merged
