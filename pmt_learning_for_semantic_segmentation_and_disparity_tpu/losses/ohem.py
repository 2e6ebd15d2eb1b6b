"""Online Hard Example Mining cross-entropy, jit-compatible.

The reference (losses/ohm_loss.py:8-54, adapted from OCNet) round-trips
through numpy: softmax on host, keep pixels whose GT-class probability is
<= 0.6 (plus a min_kept floor via argsort), then torch CE on the rebuilt
target. Here the selection is a mask and the min_kept threshold comes from a
device-side sort — no host sync, same math.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    thresh: float = 0.6,
    min_kept: int = 0,
    ignore_index: Optional[int] = 19,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """logits: (B,H,W,C); labels: (B,H,W) int. Mean CE over kept pixels."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    if ignore_index is not None:
        valid = labels != ignore_index
    else:
        valid = jnp.ones_like(labels, dtype=bool)
    safe_labels = jnp.clip(jnp.where(valid, labels, 0), 0,
                            logits.shape[-1] - 1)
    gt_prob = jnp.take_along_axis(probs, safe_labels[..., None], axis=-1)[..., 0]

    threshold = jnp.asarray(thresh, logits.dtype)
    if min_kept > 0:
        flat = jnp.where(valid, gt_prob, jnp.inf).reshape(-1)
        kth = jnp.sort(flat)[min(min_kept, flat.shape[0]) - 1]
        threshold = jnp.where(kth > thresh, kth, threshold)

    kept = valid & (gt_prob <= threshold)
    keptf = kept.astype(logits.dtype)
    ce = -jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
    if weights is not None:
        w = weights[safe_labels] * keptf
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)
    return jnp.sum(ce * keptf) / jnp.maximum(jnp.sum(keptf), 1e-8)
