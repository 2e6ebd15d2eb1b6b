"""Focal binary/multiclass Tversky loss with the reference's hand-written
backward, as a ``jax.custom_vjp``.

The reference (TverskyLoss/binarytverskyloss.py:9-108) computes the FORWARD
from hard argmax labels (so the loss value is piecewise constant) and defines
an analytic BACKWARD w.r.t. the soft probabilities. Two quirks reproduced
exactly:

* the backward IGNORES the upstream cotangent (grad_out is never used,
  binarytverskyloss.py:106-108), so outer scale factors (the 1.5x in
  multiLosses.py:93 and the 1/C class weights in multitverskyloss.py:46)
  affect the loss value but NOT the gradient;
* alpha=0.7, beta=0.3, gamma=1 are forced inside forward
  (binarytverskyloss.py:38-42) regardless of constructor args.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_ALPHA = 0.7
_BETA = 0.3
_EPS = 1e-6


@jax.custom_vjp
def focal_binary_tversky(input2: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """input2: (B,H,W,2) channel0 = 1-p, channel1 = p; target: (B,H,W) in {0,1}.
    Returns mean over batch of (1 - tversky_index) from HARD labels."""
    loss, _ = _fwd_impl(input2, target)
    return loss


def _fwd_impl(input2, target):
    b = input2.shape[0]
    hard = jnp.argmax(input2, axis=-1).astype(jnp.float32)  # (B,H,W)
    t = target.astype(jnp.float32)
    hard_f = hard.reshape(b, -1)
    t_f = t.reshape(b, -1)
    p_g = jnp.sum(hard_f * t_f, axis=1)  # TP
    p_ng = jnp.sum(hard_f * (1.0 - t_f), axis=1)  # FP
    np_g = jnp.sum((1.0 - hard_f) * t_f, axis=1)  # FN
    index = p_g / (p_g + _ALPHA * p_ng + _BETA * np_g + _EPS)
    loss = jnp.mean(1.0 - index)
    return loss, (t, p_g, p_ng, np_g)


def _fwd(input2, target):
    loss, res = _fwd_impl(input2, target)
    return loss, res


def _bwd(res, g):
    # g deliberately unused — the reference backward drops grad_out.
    t, p_g, p_ng, np_g = res
    del g
    s = (p_g + _ALPHA * p_ng + _BETA * np_g + _EPS)[:, None, None]  # (B,1,1)
    pg = p_g[:, None, None]
    sub = (_ALPHA * (1.0 - t) + t) * pg
    # gamma == 1 -> dL_dT == 1
    dT_dp0 = -2.0 * (t / s - sub / (s * s))
    dT_dp1 = _BETA * (1.0 - t) * pg / (s * s)
    grad = jnp.stack([dT_dp1, dT_dp0], axis=-1)  # ch0 <- dL_dp1, ch1 <- dL_dp0
    return grad.astype(jnp.float32), None


focal_binary_tversky.defvjp(_fwd, _bwd)


def multi_tversky_loss(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """MultiTverskyLoss (TverskyLoss/multitverskyloss.py:26-50) with default
    per-class weights 1/C. probs: (B,H,W,C) softmax; labels: (B,H,W) int."""
    c = probs.shape[-1]
    total = 0.0
    for idx in range(c):
        p = probs[..., idx]
        input2 = jnp.stack([1.0 - p, p], axis=-1)
        tgt = (labels == idx).astype(jnp.int32)
        total = total + focal_binary_tversky(input2, tgt) * (1.0 / c)
    return total
