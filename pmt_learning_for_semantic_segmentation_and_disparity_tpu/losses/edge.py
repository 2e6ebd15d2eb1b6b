"""Edge losses: class-balanced BCE (edge head) and the GSCNN-style dual-task
regularizer (gumbel-softmax boundary consistency).

Mirrors losses/multiLosses.py:166-182 and util/utilTorchGate.py:256-306.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.edges import compute_grad_mag


def balanced_edge_bce(edge_logits: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """Class-balanced BCE-with-logits on binary sobel edge maps
    (multiLosses.py:166-182): positive pixels weighted by neg/total,
    negatives by pos/total, mean reduction."""
    e = edges.astype(edge_logits.dtype)
    pos = jnp.sum(e == 1.0)
    neg = jnp.sum(e == 0.0)
    total = pos + neg
    w = jnp.where(e == 1.0, neg / total, jnp.where(e == 0.0, pos / total, 0.0))
    z = edge_logits
    # bce_with_logits, elementwise
    bce = jnp.maximum(z, 0.0) - z * e + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return jnp.mean(w * bce)


def _gumbel_softmax_sample(key, logits: jnp.ndarray, tau: float = 0.5, eps=1e-10):
    u = jax.random.uniform(key, logits.shape)
    g = -jnp.log(eps - jnp.log(u + eps))
    return jax.nn.softmax((logits + g) / tau, axis=-1)


def dual_task_loss(
    key: jax.Array,
    logits: jnp.ndarray,
    gt_full: jnp.ndarray,
    n_fg_classes: int = 19,
) -> jnp.ndarray:
    """utilTorchGate.DualTaskLoss.forward (:262-306). NHWC.

    logits: (B,H,W,C); gt_full: (B,H,W,C+1) one-hot with trailing ignore
    channel (cityscapes layout). The ignore mask comes from that last channel
    (== 1), matching utilTorchGate.py:274.
    """
    n, h, w, c = logits.shape
    th = 0.015
    eps = 1e-10
    ignore = gt_full[..., -1] == 1  # (B,H,W)
    ig = ignore[..., None]
    logits_masked = jnp.where(ig, 0.0, logits)
    gt_sem = gt_full[..., : gt_full.shape[-1] - 1]

    g_samp = _gumbel_softmax_sample(key, logits_masked, tau=0.5)
    g = compute_grad_mag(g_samp) * (~ig).astype(logits.dtype)
    g_hat = compute_grad_mag(gt_sem)

    gf = g.reshape(n, -1)
    gh = g_hat.reshape(n, -1)
    l1 = jnp.abs(gf - gh)
    m_g = (gf >= th).astype(logits.dtype)
    m_gh = (gh >= th).astype(logits.dtype)
    loss_g = jnp.sum(l1 * m_g) / (jnp.sum(m_g) + eps)
    loss_gh = jnp.sum(l1 * m_gh) / (jnp.sum(m_gh) + eps)
    return 0.5 * loss_g + 0.5 * loss_gh
