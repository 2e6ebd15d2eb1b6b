"""On-device metrics vs sklearn + the reference's numpy implementations."""
import jax.numpy as jnp
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import metrics as M

from reference_oracle import load_reference

load_reference()


def test_confusion_matrix_matches_reference_bincount(rng):
    from util.utilTorchLoss import SegAccuracyNp

    b, h, w, c = 2, 16, 16, 4
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    labels = rng.integers(0, c, (b, h, w))
    gt = np.eye(c, dtype=np.float32)[labels]

    acc_ref, conf_ref, _ = SegAccuracyNp(
        logits.transpose(0, 3, 1, 2), gt.transpose(0, 3, 1, 2), c
    )
    pred = np.argmax(logits, -1)
    conf = np.asarray(
        M.confusion_matrix(jnp.asarray(pred), jnp.asarray(labels), c,
                           valid=jnp.asarray(labels != c))
    )
    np.testing.assert_array_equal(conf, conf_ref)
    acc = float(
        M.pixel_accuracy_from_preds(jnp.asarray(pred), jnp.asarray(labels), c)
    )
    assert abs(acc - acc_ref) < 1e-6


def test_miou_matches_reference(rng):
    from util.utilTorchLoss import Mean_Intersection_over_Union, Pixel_Accuracy

    conf = rng.integers(0, 50, (5, 5)).astype(np.float64)
    miou_ref, iou_ref = Mean_Intersection_over_Union(conf)
    miou, iou = M.mean_iou(conf)
    assert abs(miou - miou_ref) < 1e-9
    np.testing.assert_allclose(iou, iou_ref)
    assert abs(M.pixel_accuracy(conf) - Pixel_Accuracy(conf)) < 1e-12


def test_branch_prf1_matches_sklearn(rng):
    from sklearn import metrics as skm

    pred = (rng.random((16, 16)) > 0.5).astype(np.float32)
    gt = (rng.random((16, 16)) > 0.5).astype(np.float32)
    # sklearn multilabel micro scores on 2-D binary maps
    # (GetSegMetricsNp, utilTorchLoss.py:289-293)
    p_ref = skm.precision_score(gt, pred, average="micro")
    r_ref = skm.recall_score(gt, pred, average="micro")
    f_ref = skm.f1_score(gt, pred, average="micro")
    p, r, f = M.branch_prf1(jnp.asarray(pred), jnp.asarray(gt))
    assert abs(float(p) - p_ref) < 1e-6
    assert abs(float(r) - r_ref) < 1e-6
    assert abs(float(f) - f_ref) < 1e-6


def test_disp_error_count_matches_reference(rng):
    from util.utilTorchLoss import unnormalizedErrorNP

    pred = rng.random((1, 1, 8, 8)).astype(np.float32)
    gt = (rng.random((1, 1, 8, 8)) * (rng.random((1, 1, 8, 8)) > 0.3)).astype(
        np.float32
    )
    err_ref, val_ref = unnormalizedErrorNP(pred, gt, 100.0)
    err, val = M.disparity_error_count(
        jnp.asarray(pred), jnp.asarray(gt), 100.0
    )
    assert float(err) == err_ref
    assert float(val) == val_ref


def test_disp_metrics_rmse_sqrel(rng):
    pred = rng.random((1, 8, 8, 1)).astype(np.float32) + 0.5
    gt = rng.random((1, 8, 8, 1)).astype(np.float32) + 0.5
    seg = np.zeros((1, 8, 8, 2), np.float32)
    seg[..., 1] = 1.0
    dm = M.disp_metrics(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(seg),
                        1.0)
    rmse_ref = np.sqrt(np.mean((gt - pred) ** 2))
    sqrel_ref = np.mean((gt - pred) ** 2 / gt)
    assert abs(float(dm.rmse) - rmse_ref) < 1e-6
    assert abs(float(dm.sq_rel) - sqrel_ref) < 1e-6
    # branch == everything here, so the CORRECT branch RMSE equals global
    # (the reference's BdispRMSE is buggy — see dispmetrics.py docstring)
    assert abs(float(dm.branch_rmse) - rmse_ref) < 1e-6
