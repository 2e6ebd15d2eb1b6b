"""On-device disparity metrics.

Mirrors utilTorchLoss.py:314-370 (>3px counts, RMSE, SqRel, branch-masked
variants). Note: the reference's BdispRMSE is a bug — it re-uses the global
RMSE (utilTorchLoss.py:339-340 takes sqrt of the already-scalar dispRMSE);
we compute the real branch RMSE and additionally expose the buggy alias for
anyone comparing raw reports.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


def disparity_error_count(
    pred: jnp.ndarray, gt: jnp.ndarray, max_disp: float
):
    """unnormalizedErrorNP (utilTorchLoss.py:363-370): count of valid pixels
    (gt>0) with |pred-gt|*max_disp > 3, plus the valid-pixel count."""
    th = (gt > 0).astype(jnp.float32)
    e = jnp.abs(pred * max_disp - gt * max_disp) * th
    err = jnp.sum((e > 3.0).astype(jnp.float32))
    valid = jnp.sum(th)
    return err, valid


class DispBatchMetrics(NamedTuple):
    err_gt3px: jnp.ndarray
    valid_px: jnp.ndarray
    rmse: jnp.ndarray
    sq_rel: jnp.ndarray
    branch_rmse: jnp.ndarray
    branch_sq_rel: jnp.ndarray


def disp_metrics(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    seg_full: jnp.ndarray,
    max_disp: float,
    mask_invalid: bool = False,
    pixel_mask: Optional[jnp.ndarray] = None,
) -> DispBatchMetrics:
    """pred/gt: (B,H,W,1); seg_full: (B,H,W,C) one-hot (channel 1 = branch).

    mask_invalid multiplies by (gt>0) first — the kitti/cityscapes 'zeros'
    mask (multiLosses.py:139,148-150). pixel_mask ((B,H,W) of 1/0) excludes
    pad_to_bucket spatial padding: means become weighted means over real
    pixels, so padded eval == native-size eval.
    """
    p = pred[..., 0]
    g = gt[..., 0]
    if mask_invalid:
        m = (g > 0).astype(p.dtype)
        p = p * m
        g = g * m
    if pixel_mask is None:
        w = jnp.ones_like(g)
    else:
        w = pixel_mask.astype(p.dtype)
        p = p * w
        g = g * w
    nw = jnp.maximum(jnp.sum(w), 1.0)
    # pads have g zeroed -> (g>0) already excludes them from the >3px count
    err, valid = disparity_error_count(p, g, max_disp)
    diff2 = (g - p) ** 2 * w
    rmse = jnp.sqrt(jnp.sum(diff2) / nw)
    ratio = jnp.where(w > 0, diff2 / jnp.where(g == 0, jnp.nan, g), 0.0)
    sq_rel = jnp.sum(ratio) / nw
    branch = (seg_full[..., 1] == 1.0).astype(p.dtype) * w
    nb = jnp.maximum(jnp.sum(branch), 1.0)
    branch_rmse = jnp.sqrt(jnp.sum(diff2 * branch) / nb)
    branch_sq_rel = jnp.sum(ratio * branch) / nb
    return DispBatchMetrics(err, valid, rmse, sq_rel, branch_rmse, branch_sq_rel)
