"""Lovász-Softmax loss, jit-compatible re-derivation.

The reference vendors the Berman 2018 implementation
(util/lovasz_losses.py:153-219) which relies on data-dependent boolean
indexing (drop ignored pixels, skip absent classes). Under XLA we keep static
shapes: ignored pixels get error 0 / fg 0 and sort to the tail where their
Lovász-gradient weight multiplies a zero error; absent classes are masked out
of the final mean. Both transformations are exact, not approximations (see
tests/test_losses.py parity checks against the vendored torch code).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors (Alg.1)."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted, axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=0)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_softmax(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    classes: str = "present",
    ignore: Optional[int] = None,
) -> jnp.ndarray:
    """probas: (B,H,W,C) probabilities; labels: (B,H,W) int. per_image=False
    (the reference always calls it that way, multiLosses.py:71)."""
    b, h, w, c = probas.shape
    p = probas.reshape(-1, c)
    l = labels.reshape(-1)
    if ignore is not None:
        valid = (l != ignore)
    else:
        valid = jnp.ones_like(l, dtype=bool)
    validf = valid.astype(p.dtype)

    losses = []
    present = []
    for cls in range(c):
        fg = ((l == cls) & valid).astype(p.dtype)
        errors = jnp.abs(fg - p[:, cls]) * validf  # ignored pixels -> 0
        # descending sort; ties between zero-error valid and ignored pixels
        # are harmless because their dot-product contribution is zero.
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        grad = _lovasz_grad(fg_sorted)
        losses.append(jnp.dot(errors_sorted, grad))
        present.append(jnp.sum(fg) > 0)

    losses = jnp.stack(losses)
    if classes == "present":
        pres = jnp.stack(present).astype(losses.dtype)
        return jnp.sum(losses * pres) / jnp.maximum(jnp.sum(pres), 1.0)
    return jnp.mean(losses)


def lovasz_hinge(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore: Optional[int] = None
) -> jnp.ndarray:
    """Binary Lovász hinge (util/lovasz_losses.py:78-111), per_image=False."""
    lg = logits.reshape(-1)
    lb = labels.reshape(-1)
    if ignore is not None:
        valid = (lb != ignore)
    else:
        valid = jnp.ones_like(lb, dtype=bool)
    validf = valid.astype(lg.dtype)
    signs = 2.0 * lb.astype(lg.dtype) - 1.0
    errors = (1.0 - lg * signs) * validf
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = (lb.astype(lg.dtype) * validf)[order]
    grad = _lovasz_grad(gt_sorted)
    return jnp.dot(jnp.maximum(errors_sorted, 0.0), grad)
