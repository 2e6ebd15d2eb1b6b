"""Disparity losses: masked L1, edge-aware smoothness, photo-consistency.

Mirrors losses/multiLosses.py:131-163 and utilTorchLoss.py:41-101. NHWC.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.edges import box_count, gaussian_smooth


def masked_l1(
    disp_pred: jnp.ndarray, disp_gt: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """L1Loss()(pred*zeros, gt*zeros) with zeros = 1 (roses/garden) or
    (gt > 0) (kitti/cityscapes) — multiLosses.py:134-141."""
    if mask is None:
        return jnp.mean(jnp.abs(disp_pred - disp_gt))
    m = mask.astype(disp_pred.dtype)
    return jnp.mean(jnp.abs(disp_pred * m - disp_gt * m))


def photo_consistency(warped_right: jnp.ndarray, left: jnp.ndarray) -> jnp.ndarray:
    """MSELoss()(warped_right, left) (torch_implementation.py:314-317)."""
    return jnp.mean((warped_right - left) ** 2)


def _grad_with_trailing_pad(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """utilTorchLoss.get_gradient: |x[i] - x[i+1]| along axis, zero-padded at
    the trailing edge. NHWC; axis 1 == 'down', axis 2 == 'right'."""
    if axis == 1:
        d = jnp.abs(img[:, :-1] - img[:, 1:])
        return jnp.pad(d, ((0, 0), (0, 1), (0, 0), (0, 0)))
    d = jnp.abs(img[:, :, :-1] - img[:, :, 1:])
    return jnp.pad(d, ((0, 0), (0, 0), (0, 1), (0, 0)))


def smoothing_gradients(
    left: jnp.ndarray, disp: jnp.ndarray, seg: jnp.ndarray
) -> jnp.ndarray:
    """Gaussian-smoothed luminance-gated disparity gradient penalty
    (utilTorchLoss.py:41-101). left: (B,H,W,3); disp: (B,H,W,1);
    seg: (B,H,W,C) one-hot. Constants (max_disp=128, 7x7 sigma-2 gaussian,
    3x3 intra-segment box mask, 0.7 scale) follow the reference."""
    max_disp = 128.0
    lum = (
        0.2126 * left[..., 0] + 0.7152 * left[..., 1] + 0.0722 * left[..., 2]
    )[..., None]
    lum = gaussian_smooth(lum, size=7, sigma=2.0)
    mask = (box_count(seg, 3, padding="SAME_ZERO") == 9.0).astype(disp.dtype)
    d_i_down = _grad_with_trailing_pad(lum, 1) * seg
    d_i_right = _grad_with_trailing_pad(lum, 2) * seg
    d_d_down = _grad_with_trailing_pad(disp / max_disp, 1) * seg * mask
    d_d_right = _grad_with_trailing_pad(disp / max_disp, 2) * seg * mask
    reg_down = d_d_down * jnp.exp(1.0 - d_i_down)
    reg_right = d_d_right * jnp.exp(1.0 - d_i_right)
    return jnp.mean(jnp.sum(reg_down, axis=-1) + jnp.sum(reg_right, axis=-1)) * 0.7
