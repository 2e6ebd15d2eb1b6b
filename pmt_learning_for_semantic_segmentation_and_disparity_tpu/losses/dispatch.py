"""Loss composition, mirroring the reference dispatcher exactly.

losses/multiLosses.py:8-157 composes the configured ``-loss`` list with
fixed weighting rules (0.5 CE when >2 losses, 1.5x tversky/ohem, duplicate
area_ce when combined with cross_entropy, …). This module builds a pure,
jittable loss function from the static config; metrics are computed
separately (metrics/), on device, instead of the reference's per-step numpy
round-trips.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import seg as seg_losses
from .disp import masked_l1, smoothing_gradients
from .lovasz import lovasz_softmax
from .ohem import ohem_cross_entropy
from .tversky import multi_tversky_loss
from .edge import dual_task_loss

# multiLosses.py:46-57
CITYSCAPES_SEG_WEIGHTS = np.array(
    [
        5.90603017, 6.01238231, 5.90603017, 8.30641645, 7.77132999,
        5.89333853, 7.25674024, 6.0150282, 5.94274377, 7.26202977,
        6.12480687, 6.45807453, 8.21414722, 5.99393149, 9.55426071,
        9.760075, 10.09886577, 9.2037169, 7.2726336,
    ],
    dtype=np.float32,
)


def seg_class_weights(dataset_name: str, n_labels: int) -> np.ndarray:
    if dataset_name in ("cityscapes", "kitti"):
        return CITYSCAPES_SEG_WEIGHTS
    return np.ones((n_labels,), np.float32)


def compose_seg_loss(
    loss_types: Sequence[str],
    dataset_name: str,
    n_labels: int,
    seg_weight: bool = False,
):
    """Return fn(logits, gt_full, key=None) -> scalar loss.

    logits: (B,H,W,C_fg); gt_full: (B,H,W,C_full) one-hot (with trailing
    ignore channel for cityscapes/kitti). Matches lossSeg_fn multiLosses.py:8-117.
    """
    loss_types = list(loss_types)
    if dataset_name in ("garden", "roses"):
        ignore = None
    else:
        ignore = 19
    weights = (
        jnp.asarray(seg_class_weights(dataset_name, n_labels)) if seg_weight else None
    )

    def fn(logits, gt_full, key: Optional[jax.Array] = None):
        if ignore is None:
            gt = gt_full
        else:
            gt = gt_full[..., : gt_full.shape[-1] - 1]
        labels_full = jnp.argmax(gt_full, axis=-1)
        loss = jnp.asarray(0.0, jnp.float32)

        if "binary_ce" in loss_types:
            probs = jax.nn.sigmoid(logits)
            loss = loss + seg_losses.binary_ce(probs, gt, weights)
            log_probs = probs  # downstream losses see the sigmoid (ref quirk)
        else:
            if "dual_edge_reg" in loss_types:
                assert key is not None, "dual_edge_reg needs an rng key"
                loss = loss + dual_task_loss(key, logits, gt_full)
            if "ohm_loss" in loss_types:
                loss = loss + 1.5 * ohem_cross_entropy(
                    logits, labels_full, ignore_index=19
                )
            log_probs = jax.nn.log_softmax(logits, axis=-1)

        if "cross_entropy" in loss_types:
            w1 = 0.5 if len(loss_types) > 2 else 1.0
            loss = loss + w1 * seg_losses.categorical_cross_entropy(
                log_probs, gt, weights
            )
            if "lovasz_loss" in loss_types:
                loss = loss + w1 * lovasz_softmax(
                    jax.nn.softmax(log_probs, axis=-1), labels_full, ignore=ignore
                )
            if "area_ce" in loss_types:
                loss = loss + seg_losses.area_ce_loss(log_probs, gt, area_dim=7)
        elif "lovasz_loss" in loss_types:
            loss = loss + lovasz_softmax(
                jax.nn.softmax(log_probs, axis=-1), labels_full, ignore=ignore
            )

        if "tversky_loss2" in loss_types:
            loss = loss + 1.5 * seg_losses.tversky_loss2(
                jax.nn.softmax(log_probs, axis=-1), gt, weights
            )
        if "tversky_loss" in loss_types:
            loss = loss + 1.5 * multi_tversky_loss(
                jax.nn.softmax(log_probs, axis=-1), labels_full
            )
        if "area_ce" in loss_types:
            # reference applies a SECOND area_ce (default area 5) even when the
            # cross_entropy branch already added one (multiLosses.py:75-78, 98-99)
            loss = loss + seg_losses.area_ce_loss(log_probs, gt, area_dim=5)
        if "categoricalNlll" in loss_types:
            loss = loss + seg_losses.categorical_nll(log_probs, gt_full, weights)
        if "area_hinge" in loss_types:
            loss = loss + seg_losses.area_hinge_loss(log_probs, gt)
        if "dice_loss" in loss_types:
            loss = loss + seg_losses.dice_loss(log_probs, gt)
        elif "diceEntropy" in loss_types:
            loss = loss + seg_losses.dice_entropy(log_probs, gt)
        return loss

    return fn


def compose_disp_loss(loss_types: Sequence[str], dataset_name: str, output_type: str):
    """Return fn(left, gt_seg_full, disp_gt, disp_pred) -> scalar.

    Matches lossDisp_fn (multiLosses.py:131-157): masked L1 (mask = gt>0 for
    kitti/cityscapes, none for roses/garden) plus optional edge-aware
    smoothness."""
    loss_types = list(loss_types)
    use_mask = dataset_name not in ("garden", "roses")
    is_multitask = output_type == "multitask"

    def fn(left, gt_seg_full, disp_gt, disp_pred):
        loss = jnp.asarray(0.0, jnp.float32)
        if not is_multitask:
            mask = (disp_gt > 0) if use_mask else None
            loss = loss + masked_l1(disp_pred, disp_gt, mask)
        if "smooth_grad" in loss_types:
            loss = loss + smoothing_gradients(left, disp_pred, gt_seg_full)
        return loss

    return fn
