"""Differentiable horizontal disparity warping.

TPU-native re-design of the reference's flattened-index gather
``apply_disparity`` (models/torch_dsnet.py:10-86): sample each pixel at
``x + offset`` with clamping to [0, W-1] and linear interpolation along x.
Used by the warp model family (models/dsnet_t2_warp.py:811,946) as
``apply_disparity(right, -disp)`` to backward-warp the right image into the
left view.

Implemented as a vectorized one-hot-free gather (``take_along_axis``), NHWC.
"""
from __future__ import annotations

import jax.numpy as jnp


def apply_disparity(images: jnp.ndarray, x_offset: jnp.ndarray) -> jnp.ndarray:
    """images: (B,H,W,C); x_offset: (B,H,W) or (B,H,W,1). Returns (B,H,W,C).

    output[b,y,x] = lerp(images[b,y,floor(xs)], images[b,y,floor(xs)+1])
    where xs = clip(x + x_offset, 0, W-1).
    """
    b, h, w, c = images.shape
    if x_offset.ndim == 4:
        x_offset = x_offset[..., 0]
    # coordinates in the offset dtype, fp32 minimum (bf16 offsets upcast for
    # sub-pixel precision; fp64 offsets keep fp64, matching torch promotion
    # of the reference's fp32 grid + offsets — torch_dsnet.py:30-42)
    dt = jnp.promote_types(x_offset.dtype, jnp.float32)
    x_base = jnp.arange(w, dtype=dt)[None, None, :]
    xs = jnp.clip(x_base + x_offset.astype(dt), 0.0, w - 1.0)
    x0 = jnp.floor(xs)
    i0 = x0.astype(jnp.int32)[..., None]  # (B,H,W,1)
    i1 = jnp.minimum(i0 + 1, w - 1)
    # The reference clamps x1 BEFORE computing weight_l = x1 - x
    # (torch_dsnet.py:52-81), so every coordinate clamped to the right edge
    # (xs == W-1, incl. all out-of-range offsets) gets weight_l = weight_r
    # = 0 and samples to ZERO. Occlusion-masking by construction — keep the
    # exact semantics for checkpoint/eval parity.
    w_l = (i1[..., 0].astype(dt) - xs)[..., None]
    w_r = (xs - x0)[..., None]
    pix_l = jnp.take_along_axis(images, jnp.broadcast_to(i0, (b, h, w, c)), axis=2)
    pix_r = jnp.take_along_axis(images, jnp.broadcast_to(i1, (b, h, w, c)), axis=2)
    out = w_l * pix_l + w_r * pix_r
    return out.astype(images.dtype)
