"""Evaluation layer tests: tiled inference, TTA, metric accumulator."""
import jax
import jax.numpy as jnp
import numpy as np

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import evaluation as E


def test_tiled_inference_covers_image():
    def fake_apply(left, right):
        b = left.shape[0]
        return {
            "seg1": jnp.ones((b, left.shape[1], left.shape[2], 2)),
            "seg2": jnp.ones((b, left.shape[1], left.shape[2], 2)),
            "disp1": jnp.ones((b, left.shape[1], left.shape[2], 1)),
        }

    left = jnp.zeros((1, 512, 1024, 3))
    out = E.tiled_inference(fake_apply, left, left,
                            window=(256, 512), stride=(128, 256))
    assert out["seg1"].shape == (1, 512, 1024, 2)
    # every pixel covered at least once
    assert float(out["window_counts"].min()) >= 1.0
    # interior pixels overlap-averaged with sub_crop^2 weight
    # (divideNetOutput weighting, torch_implementation.py:93-98)
    assert float(out["seg1"][0, 256, 512, 0]) == 1.0  # 4 windows * 0.25


def test_tiled_inference_slide_window_mode():
    def fake_apply(left, right):
        b = left.shape[0]
        return {
            "seg1": jnp.zeros((b, left.shape[1], left.shape[2], 2)),
            "seg2": jnp.zeros((b, left.shape[1], left.shape[2], 2)),
            "disp1": jnp.ones((b, left.shape[1], left.shape[2], 1)),
        }

    left = jnp.zeros((1, 512, 512, 3))
    out = E.tiled_inference(fake_apply, left, left, window=(512, 512),
                            stride=(256, 256), softmax_seg=True)
    # softmax of zeros = 0.5 per class, one window
    np.testing.assert_allclose(np.asarray(out["seg1"]), 0.5)


def test_tta_hflip_average():
    # forward that depends on orientation: returns x's first channel
    def forward(x):
        return x[..., :1] * 2.0

    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 2, 8, 1)
    x = jnp.tile(x, (1, 1, 1, 3))
    out = E.tta(forward, x, net_type="unet")
    # hflip(f(hflip(x))) == f(x) for this linear f => average equals f(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(forward(x)),
                               rtol=1e-5)


def test_tta_multiscale_runs():
    def forward(x):
        return x[..., :1]

    x = jnp.ones((1, 16, 16, 3))
    out = E.tta(forward, x, scales=[0.5], net_type="unet")
    assert out.shape == (1, 16, 16, 1)


def test_metric_accumulator_tables():
    acc = E.MetricAccumulator()
    for i in range(3):
        acc.update({
            "loss": 1.0 + i, "pixel_acc2": 0.5,
            "conf1": np.eye(2) * (i + 1), "conf2": np.eye(2) * (i + 1),
        })
    s = acc.summary(class_names=["bg", "branch"])
    assert abs(s["loss"] - 2.0) < 1e-6
    assert s["miou2"] == 1.0  # diagonal confusion
    assert "iou_branch" in s
    t = acc.table()
    assert "running" in t
    ft = acc.final_table()
    assert "±" in ft


def test_confusion_matrix_png(tmp_path):
    E.save_confusion_matrix_png(
        np.array([[5, 1], [2, 7]], np.float64), ["bg", "branch"],
        str(tmp_path / "cm.png"),
    )
    assert (tmp_path / "cm.png").exists()


def test_dump_prediction_images(tmp_path):
    E.dump_prediction_images(
        str(tmp_path), 3,
        np.random.randn(1, 16, 16, 2).astype(np.float32),
        np.eye(2, dtype=np.float32)[np.zeros((1, 16, 16), int)],
        np.random.rand(1, 16, 16, 1).astype(np.float32),
        np.random.rand(1, 16, 16, 1).astype(np.float32),
    )
    assert (tmp_path / "segPred_3.jpg").exists()
    assert (tmp_path / "dispGT_3.jpg").exists()


def test_spatial_band_split_merge_roundtrip():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.parallel import (
        split_bands,
        merge_bands,
        spatial_shard_infer,
    )

    x = jnp.arange(2 * 64 * 16 * 3, dtype=jnp.float32).reshape(2, 64, 16, 3)
    bands, meta, full = split_bands(x, 4, halo=8)
    assert bands.shape == (8, 32, 16, 3)
    back = merge_bands(bands, meta, full, halo=8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    # identity 'model' through the band path
    out = spatial_shard_infer(
        lambda l, r: {"seg1": l}, x, x, n_bands=4, halo=8
    )
    np.testing.assert_array_equal(np.asarray(out["seg1"]), np.asarray(x))
