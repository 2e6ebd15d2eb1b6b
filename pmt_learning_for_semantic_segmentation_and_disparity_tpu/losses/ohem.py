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


def kth_smallest(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-th smallest (1-indexed) of a float32 vector WITHOUT sorting.

    A full XLA sort of the ~1M-pixel batch dominated the training-step
    profile (BENCH_NOTES round 2); selecting one order statistic only
    needs a 32-pass radix descent: map f32 to its monotone uint32 key,
    then fix the result bit-by-bit from the MSB with a count-reduction
    per bit. Each pass is one cheap VPU reduction; total ~32 passes vs
    O(n log^2 n) bitonic sort stages. Returns exactly ``jnp.sort(x)[k-1]``
    (totally ordered; -0.0/+0.0 and NaN follow the IEEE bit order).
    """
    # the statistic feeds a comparison only — no gradient path exists, and
    # bitcast has no JVP rule, so cut autodiff explicitly
    x = jax.lax.stop_gradient(x)
    bits = jax.lax.bitcast_convert_type(x.reshape(-1), jnp.uint32)
    # monotone mapping: negative floats -> ~bits (descending -> ascending),
    # non-negative -> bits | sign bit
    sign = jnp.uint32(0x80000000)
    key = jnp.where(bits & sign != 0, ~bits, bits | sign)
    kk = jnp.uint32(k)

    def body(i, res):
        cand = res | (jnp.uint32(1) << jnp.uint32(31 - i))
        cnt = jnp.sum((key < cand).astype(jnp.uint32))
        # fewer than k keys below cand -> the k-th smallest is >= cand
        return jnp.where(cnt < kk, cand, res)

    res = jax.lax.fori_loop(0, 32, body, jnp.uint32(0))
    back = jnp.where(res & sign != 0, res ^ sign, ~res)
    return jax.lax.bitcast_convert_type(back, jnp.float32)


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
    if ignore_index is not None:
        valid = labels != ignore_index
    else:
        valid = jnp.ones_like(labels, dtype=bool)
    safe_labels = jnp.clip(jnp.where(valid, labels, 0), 0,
                            logits.shape[-1] - 1)
    # one-hot pick of the GT-class log-prob (see losses/seg.pick_class — a
    # minor-axis gather here cost ~12 ms/step on TPU); exp of the picked
    # value equals picking from exp(log_probs) elementwise-exactly, and
    # skips materializing the full probs tensor.
    from .seg import class_weight_map, pick_class

    picked_logp = pick_class(log_probs, safe_labels)
    gt_prob = jnp.exp(picked_logp)

    threshold = jnp.asarray(thresh, logits.dtype)
    if min_kept > 0:
        flat = jnp.where(valid, gt_prob, jnp.inf).reshape(-1)
        kth = kth_smallest(flat.astype(jnp.float32),
                           min(min_kept, flat.shape[0])).astype(logits.dtype)
        threshold = jnp.where(kth > thresh, kth, threshold)

    kept = valid & (gt_prob <= threshold)
    keptf = kept.astype(logits.dtype)
    ce = -picked_logp
    if weights is not None:
        w = class_weight_map(weights, safe_labels) * keptf
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)
    return jnp.sum(ce * keptf) / jnp.maximum(jnp.sum(keptf), 1e-8)
