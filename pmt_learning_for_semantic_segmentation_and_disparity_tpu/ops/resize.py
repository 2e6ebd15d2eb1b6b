"""Resize ops with exact torch ``F.interpolate`` semantics, NHWC layout.

The reference mixes three interpolation flavors that must be reproduced for
parity (models/dsnet_t2.py:1204-1222 bilinear, 1211/1243/1252 nearest;
torch_implementation.py:160-166 bilinear align_corners=True):

* ``nearest`` — torch computes src = floor(dst * in/out)
* ``bilinear`` (align_corners=False) — half-pixel centers; identical to
  ``jax.image.resize`` 'linear'
* ``bilinear`` align_corners=True — src = dst*(in-1)/(out-1)

All functions take/return NHWC arrays (TPU-native layout).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') for NHWC input."""
    n, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w):
        return x
    if oh % h == 0 and ow % w == 0:
        # integer upsample: floor(i*h/oh) == i // k, so torch-nearest is an
        # exact pixel repeat — broadcast+reshape, far cheaper than gather
        kh, kw = oh // h, ow // w
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, kh, w, kw, c))
        return x.reshape(n, oh, ow, c)
    if h % oh == 0 and w % ow == 0:
        # integer downsample: floor(i*h/oh) == i*k — strided slice
        return x[:, :: h // oh, :: w // ow]
    # torch nearest: src_idx = floor(dst_idx * in/out)
    rows = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    rows = jnp.clip(rows, 0, h - 1)
    cols = jnp.clip(cols, 0, w - 1)
    return x[:, rows][:, :, cols]


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """scale_factor upsampling; equals repeat along H and W."""
    n, h, w, c = x.shape
    return resize_nearest(x, (h * factor, w * factor))


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch bilinear, align_corners=False (half-pixel). NHWC."""
    n, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w):
        return x
    # antialias=False: torch F.interpolate(bilinear) does plain 2-tap
    # interpolation even when downscaling
    out = jax.image.resize(x, (n, oh, ow, c), method="linear", antialias=False)
    return out.astype(x.dtype)


def _linear_weights_ac(in_size: int, out_size: int, dt=jnp.float32):
    if out_size == 1:
        src = jnp.zeros((1,), dt)
    else:
        src = jnp.arange(out_size, dtype=dt) * ((in_size - 1) / (out_size - 1))
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = src - lo.astype(dt)
    return lo, hi, frac


def resize_bilinear_align_corners(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch bilinear with align_corners=True (deeplab eval path,
    torch_implementation.py:160-166). NHWC. Interpolates in the input's
    dtype, fp32 minimum (bf16 upcast; fp64 stays fp64 — torch interpolates
    double inputs in double)."""
    n, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w):
        return x
    dt = jnp.promote_types(x.dtype, jnp.float32)
    rlo, rhi, rfrac = _linear_weights_ac(h, oh, dt)
    clo, chi, cfrac = _linear_weights_ac(w, ow, dt)
    xf = x.astype(dt)
    top = xf[:, rlo]
    bot = xf[:, rhi]
    rows = top + (bot - top) * rfrac[None, :, None, None]
    left = rows[:, :, clo]
    right = rows[:, :, chi]
    out = left + (right - left) * cfrac[None, None, :, None]
    return out.astype(x.dtype)


def avg_pool(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """nn.AvgPool2d(window, stride) — floor division of spatial dims, no pad.

    Used by the PSM-style pyramid branches (models/dsnet_t2.py:1983-2021).
    NHWC.
    """
    n, h, w, c = x.shape
    import numpy as np

    out = jax.lax.reduce_window(
        x,
        np.zeros((), x.dtype)[()],  # python/numpy scalar literal — a traced
        # init value breaks reduce_window's linearization under bf16
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return out / float(window * window)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int] = (1, 1)) -> jnp.ndarray:
    """nn.AdaptiveAvgPool2d — only the global (1,1) case is used (ASPP)."""
    if out_hw != (1, 1):
        raise NotImplementedError("only global pooling supported")
    return jnp.mean(x, axis=(1, 2), keepdims=True)
