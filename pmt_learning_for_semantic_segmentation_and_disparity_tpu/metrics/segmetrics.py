"""On-device segmentation metrics.

The reference computes every metric per training step in numpy + sklearn,
synchronizing the device and writing jpgs as a side effect
(util/utilTorchLoss.py:198-343, SURVEY.md §3.1 hot-loop note). Here the
confusion matrix is a one-hot matmul (MXU) and everything derives from it on
device; image dumping is an explicit eval-only utility (evaluation/).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    pred_labels: jnp.ndarray,
    gt_labels: jnp.ndarray,
    n_labels: int,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Confusion matrix [gt, pred] via one-hot matmul; (n,n) float32.

    Equivalent to np.bincount(labels*gt+pred) (utilTorchLoss.py:232-234) but
    stays on device and uses the MXU.
    """
    gt1 = (gt_labels[..., None] == jnp.arange(n_labels)).astype(jnp.float32)
    pr1 = (pred_labels[..., None] == jnp.arange(n_labels)).astype(jnp.float32)
    if valid is not None:
        gt1 = gt1 * valid[..., None].astype(jnp.float32)
    gt_f = gt1.reshape(-1, n_labels)
    pr_f = pr1.reshape(-1, n_labels)
    return jnp.einsum("pg,pq->gq", gt_f, pr_f, preferred_element_type=jnp.float32)


def pixel_accuracy_from_preds(
    pred_labels: jnp.ndarray,
    gt_labels: jnp.ndarray,
    n_labels: int,
    pixel_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """SegAccuracyNp (utilTorchLoss.py:221-236): accuracy over pixels whose
    gt label != n_labels (the ignore channel argmax)."""
    mask = (gt_labels != n_labels).astype(jnp.float32)
    if pixel_mask is not None:
        mask = mask * pixel_mask
    acc = (pred_labels == gt_labels).astype(jnp.float32) * mask
    return jnp.sum(acc) / jnp.maximum(jnp.sum(mask), 1.0)


def pixel_accuracy(conf: np.ndarray) -> float:
    """utilTorchLoss.py:451-452."""
    return float(np.diag(conf).sum() / conf.sum())


def pixel_accuracy_class(conf: np.ndarray) -> float:
    """utilTorchLoss.py:455-458."""
    with np.errstate(invalid="ignore", divide="ignore"):
        acc = np.diag(conf) / conf.sum(axis=1)
    return float(np.nanmean(acc))


def mean_iou(conf: np.ndarray):
    """utilTorchLoss.py:461-466; returns (mIoU, per-class IoU)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        iou = np.diag(conf) / (
            conf.sum(axis=1) + conf.sum(axis=0) - np.diag(conf)
        )
    return float(np.nanmean(iou)), iou


def branch_prf1(pred_binary: jnp.ndarray, gt_binary: jnp.ndarray, mask=None):
    """micro precision/recall/F1 on binary branch maps, the on-device
    equivalent of GetSegMetricsNp's sklearn calls (utilTorchLoss.py:289-293).
    For multilabel-binary input micro-P = TP/(TP+FP), micro-R = TP/(TP+FN).
    """
    p = pred_binary.astype(jnp.float32)
    g = gt_binary.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        p = p * m
        g = g * m
    tp = jnp.sum(p * g)
    fp = jnp.sum(p * (1.0 - g)) if mask is None else jnp.sum(p) - tp
    fn = jnp.sum(g) - tp
    prec = tp / jnp.maximum(tp + fp, 1e-8)
    rec = tp / jnp.maximum(tp + fn, 1e-8)
    f1 = 2.0 * prec * rec / jnp.maximum(prec + rec, 1e-8)
    return prec, rec, f1


class SegBatchMetrics(NamedTuple):
    pixel_acc: jnp.ndarray
    confusion: jnp.ndarray  # (n,n)
    precision: jnp.ndarray
    recall: jnp.ndarray
    f1: jnp.ndarray
    branch_f1: jnp.ndarray


def seg_batch_metrics(
    logits: jnp.ndarray, gt_full: jnp.ndarray, n_labels: int,
    pixel_mask: Optional[jnp.ndarray] = None,
) -> SegBatchMetrics:
    """All per-batch seg metrics in one fused device computation.

    logits: (B,H,W,C_fg); gt_full: (B,H,W,C_full) one-hot. The binary
    branch metrics follow GetSegMetricsNp's roses convention: channel 1
    thresholded at logit > 0 (utilTorchLoss.py:263-266).

    pixel_mask: optional (B,H,W) 1/0 map of REAL pixels — excludes the
    spatial padding added by pad_to_bucket from every metric (the
    reference evaluates at native image size).
    """
    pred = jnp.argmax(logits, axis=-1)
    gt = jnp.argmax(gt_full, axis=-1)
    valid = (gt != n_labels).astype(jnp.float32)
    if pixel_mask is not None:
        valid = valid * pixel_mask
    conf = confusion_matrix(pred, gt, n_labels, valid=valid)
    acc = pixel_accuracy_from_preds(pred, gt, n_labels, pixel_mask)
    if logits.shape[-1] > 1:
        pred_branch = (logits[..., 1] > 0).astype(jnp.float32)
        gt_branch = (gt_full[..., 1] == 1.0).astype(jnp.float32)
    else:
        pred_branch = (logits[..., 0] > 0).astype(jnp.float32)
        gt_branch = (gt_full[..., 0] == 1.0).astype(jnp.float32)
    if pixel_mask is not None:
        pred_branch = pred_branch * pixel_mask
        gt_branch = gt_branch * pixel_mask
    prec, rec, f1 = branch_prf1(pred_branch, gt_branch)
    branch_mask = jnp.maximum(gt_branch, pred_branch)
    _, _, bf1 = branch_prf1(pred_branch, gt_branch, mask=branch_mask)
    return SegBatchMetrics(acc, conf, prec, rec, f1, bf1)
