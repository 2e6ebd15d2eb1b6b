"""Test-time augmentation for the seg nets.

Re-design of SegmentatorTTA (models_deeplab/tta.py:3-42): horizontal-flip
and optional multi-scale predict-average, with the deeplab pad/interp
alignment (pred_resize pads by 1 and resizes with align_corners=True).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp

from ..ops.resize import resize_bilinear_align_corners


def hflip(x: jnp.ndarray) -> jnp.ndarray:
    return x[:, :, ::-1, :]


def pred_resize(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    size: Tuple[int, int],
    net_type: str = "deeplab",
) -> jnp.ndarray:
    h, w = size
    if net_type == "unet":
        pred = forward(x)
        if (x.shape[1], x.shape[2]) == size:
            return pred
        return resize_bilinear_align_corners(pred, size)
    pred = forward(jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0))))
    return resize_bilinear_align_corners(pred, (h + 1, w + 1))[:, :h, :w]


def tta(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    scales: Optional[Sequence[float]] = None,
    net_type: str = "deeplab",
) -> jnp.ndarray:
    """hflip (+multi-scale) averaged prediction (tta.py:28-42)."""
    size = (x.shape[1], x.shape[2])
    seg_sum = pred_resize(forward, x, size, net_type)
    seg_sum = seg_sum + hflip(pred_resize(forward, hflip(x), size, net_type))
    if scales is None:
        return seg_sum / 2.0
    for s in scales:
        hs = max(1, int(round(x.shape[1] * s)))
        ws = max(1, int(round(x.shape[2] * s)))
        scaled = resize_bilinear_align_corners(x, (hs, ws))
        seg_sum = seg_sum + pred_resize(forward, scaled, size, net_type)
        seg_sum = seg_sum + hflip(pred_resize(forward, hflip(scaled), size, net_type))
    return seg_sum / ((len(scales) + 1) * 2.0)
