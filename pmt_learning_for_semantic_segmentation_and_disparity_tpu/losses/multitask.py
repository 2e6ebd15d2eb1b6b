"""Kendall-style uncertainty-weighted multitask loss.

Mirror of util/utilTorchLoss.py:521-540 (multiTask_loss module): learned
log-variances scale per-pixel L1 (disparity) and CE (two seg heads). The
log-variance parameters live in the owning model's param tree; this module is
the pure function.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def multitask_loss(
    log_var_disp: jnp.ndarray,
    log_var_seg1: jnp.ndarray,
    log_var_seg2: Optional[jnp.ndarray],
    disp: jnp.ndarray,
    disp_gt: jnp.ndarray,
    seg1_logits: jnp.ndarray,
    seg2_logits: Optional[jnp.ndarray],
    seg_labels: jnp.ndarray,
    ignore_index: int = 19,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns per-pixel (loss_disp, loss_seg1, loss_seg2) like the reference
    (reduction='none'); callers .mean() them (torch_implementation.py:174-176).
    NHWC; seg_labels: (B,H,W) int."""

    def ce(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        valid = (seg_labels != ignore_index)
        safe = jnp.where(valid, seg_labels, 0)
        from .seg import pick_class

        pix = -pick_class(logp, safe)
        return jnp.where(valid, pix, 0.0)

    loss_disp = jnp.exp(-log_var_disp) * jnp.abs(disp - disp_gt) + log_var_disp
    loss_seg1 = jnp.exp(-log_var_seg1) * ce(seg1_logits) + log_var_seg1
    if seg2_logits is not None and log_var_seg2 is not None:
        loss_seg2 = jnp.exp(-log_var_seg2) * ce(seg2_logits) + log_var_seg2
    else:
        loss_seg2 = jnp.zeros((1,), disp.dtype)
    return loss_disp, loss_seg1, loss_seg2
