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

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _sorted_errors(err: jnp.ndarray, pay: jnp.ndarray):
    """Descending sort of ``err`` along the last axis with ``pay`` riding
    as a (non-differentiated) payload; returns ``(-err_sorted, pay_sorted)``.

    custom_vjp rationale: jax's native sort transpose un-permutes the
    cotangent with a scatter, which costs ~7 ms/step at the flagship's
    (1M,) shape on v5e; un-permuting by a SECOND key-value sort on the
    saved permutation (unique i32 keys) is ~5x cheaper (BENCH_NOTES
    round 3b). Values are identical: a permutation scatter and a sort by
    the permutation compute the same reordering.
    """
    return jax.lax.sort((-err, pay), dimension=err.ndim - 1,
                        is_stable=False, num_keys=1)


def _sorted_errors_fwd(err, pay):
    n = err.shape[-1]
    iota = jnp.broadcast_to(
        jax.lax.iota(jnp.int32, n), err.shape)
    neg_s, pay_s, perm = jax.lax.sort(
        (-err, pay, iota), dimension=err.ndim - 1,
        is_stable=False, num_keys=1)
    return (neg_s, pay_s), perm


def _sorted_errors_bwd(perm, cts):
    g_neg, _ = cts
    # position i of the result gets g_neg[j] where perm[j] == i, i.e. the
    # cotangent un-permuted back to input order; d(-err)/d(err) = -1.
    _, g_err = jax.lax.sort((perm, g_neg), dimension=perm.ndim - 1,
                            is_stable=False, num_keys=1)
    return -g_err, jnp.zeros_like(cts[1])


_sorted_errors.defvjp(_sorted_errors_fwd, _sorted_errors_bwd)


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


def _lovasz_grad_batched(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """_lovasz_grad over a batch of sorted vectors: (C, N) -> (C, N)."""
    gts = jnp.sum(gt_sorted, axis=1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=1)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=1)
    jaccard = 1.0 - intersection / union
    if gt_sorted.shape[1] > 1:
        jaccard = jnp.concatenate(
            [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1)
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

    if c == 2:
        # C=2 fast path: softmax rows sum to 1, so the two per-class error
        # vectors coincide elementwise — |fg0-p0| = |(1-fg1)-(1-p1)| =
        # |fg1-p1| on valid pixels, and both are zeroed on ignored ones.
        # ONE single-row sort with a packed payload (pay = fg0 + 2*fg1,
        # exact in bf16) therefore replaces the (2,N) sort: key-compare
        # work halves and payload traffic drops ~2.4x. The only fp
        # deviation vs the general path is <=1 ulp per key from softmax
        # rounding (p0+p1 ~ 1), i.e. O(1e-7) at the loss — the torch-oracle
        # parity suite (tests/test_losses.py) runs this path unchanged.
        fg0 = ((l == 0) & valid).astype(p.dtype)
        fg1 = ((l == 1) & valid).astype(p.dtype)
        err = jnp.abs(fg1 - p[:, 1]) * validf
        pay = (fg0 + 2.0 * fg1).astype(jnp.bfloat16)
        neg_sorted, pay_s = _sorted_errors(err, pay)
        fg_sorted = jnp.stack([pay_s == jnp.bfloat16(1.0),
                               pay_s == jnp.bfloat16(2.0)]).astype(p.dtype)
        grad = _lovasz_grad_batched(fg_sorted)
        losses = jnp.sum(-neg_sorted[None, :] * grad, axis=1)
        if classes == "present":
            pres = jnp.stack([jnp.sum(fg0) > 0,
                              jnp.sum(fg1) > 0]).astype(losses.dtype)
            return jnp.sum(losses * pres) / jnp.maximum(jnp.sum(pres), 1.0)
        return jnp.mean(losses)

    # ONE batched stable key-value sort over all classes: fg rides along as
    # a sort operand, so no argsort + two 1M-pixel gathers per class (those
    # gathers dominated the training-step profile, BENCH_NOTES round 2).
    # Identical ordering to the previous per-class stable argsort.
    cls_ids = jnp.arange(c)
    fg_all = ((l[None, :] == cls_ids[:, None])
              & valid[None, :]).astype(p.dtype)          # (C, N)
    errors_all = jnp.abs(fg_all - p.T) * validf[None, :]
    # descending UNSTABLE sort (torch.sort's default is unstable too): the
    # loss is tie-order invariant — within a tied-key block the err·Δjaccard
    # dot telescopes, so only the block's fg COUNT matters, which any
    # permutation preserves. Unstable is 16.0 -> 10.3 ms at (2, 1M) on v5e
    # (tools/bench_sort.py, BENCH_NOTES round 3).
    neg_sorted, fg_sorted = _sorted_errors(errors_all, fg_all)
    grad = _lovasz_grad_batched(fg_sorted)
    losses = jnp.sum(-neg_sorted * grad, axis=1)

    if classes == "present":
        pres = (jnp.sum(fg_all, axis=1) > 0).astype(losses.dtype)
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
    gt = lb.astype(lg.dtype) * validf
    neg_sorted, gt_sorted = _sorted_errors(errors, gt)
    grad = _lovasz_grad(gt_sorted)
    return jnp.dot(jnp.maximum(-neg_sorted, 0.0), grad)
