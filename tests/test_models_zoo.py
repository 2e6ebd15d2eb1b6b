"""Shape tests for the wider zoo: psmnet, deeplab(+mod), warp family."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig
from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models


def _run(cfg, h=32, w=64, **kwargs):
    model = models.get_network(cfg)
    left = jnp.zeros((1, h, w, 3), jnp.float32)
    right = jnp.zeros((1, h, w, 3), jnp.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, left, right,
                    train=False, **kwargs)
    return model.apply(vs, left, right, train=False, **kwargs)


def test_psmnet_eval_shapes():
    cfg = PMTConfig()
    cfg.model.net = "pspnet"
    cfg.model.max_disp_psm = 48  # small D for the CPU test
    cfg.data.dataset_name = "roses"
    out = _run(cfg, 32, 64)
    assert out["disp1"].shape == (1, 32, 64, 1)
    d = np.asarray(out["disp1"])
    assert (d >= 0).all() and (d <= 48).all()  # soft-argmin range


def test_psmnet_training_three_preds():
    cfg = PMTConfig()
    cfg.model.net = "pspnet"
    cfg.model.max_disp_psm = 16
    model = models.get_network(cfg)
    left = jnp.zeros((1, 16, 32, 3))
    vs = model.init({"params": jax.random.PRNGKey(0)}, left, left, train=False)
    out, _ = model.apply(vs, left, left, train=True, mutable=["batch_stats"])
    assert len(out["preds"]) == 3


def test_psmnet_pad_to_16():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.psmnet import (
        pad_to_multiple_of_16,
    )

    l = jnp.zeros((1, 30, 50, 3))
    lp, rp, (ph, pw) = pad_to_multiple_of_16(l, l)
    assert lp.shape == (1, 32, 64, 3) and (ph, pw) == (2, 14)


def test_deeplab_mono_shapes():
    cfg = PMTConfig()
    cfg.model.net = "deeplab"
    cfg.data.dataset_name = "cityscapes"
    out = _run(cfg, 32, 64)
    assert out["seg1"].shape == (1, 8, 16, 19)  # /4 logits (decoder res)


def test_deeplab_pre_post_process():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.deeplab import (
        deeplab_preprocess,
        deeplab_postprocess,
    )

    left = jnp.zeros((1, 32, 64, 3))
    lp, _, hw = deeplab_preprocess(left)
    assert lp.shape == (1, 33, 65, 3)
    logits = jnp.zeros((1, 9, 17, 19))
    out = deeplab_postprocess(logits, hw)
    assert out.shape == (1, 32, 64, 19)


def test_deeplab_mod_stereo_shapes():
    cfg = PMTConfig()
    cfg.model.net = "deeplab_mod"
    cfg.data.dataset_name = "cityscapes"
    out = _run(cfg, 32, 64)
    assert out["seg1"].shape == (1, 8, 16, 19)
    assert out["disp1"].shape == (1, 8, 16, 1)
    assert out["seg2"].shape == (1, 8, 16, 19)


@pytest.mark.parametrize("net", ["dsnet_warp", "dsnet_warp_soft"])
def test_warp_family_shapes(net):
    cfg = PMTConfig()
    cfg.model.net = net
    cfg.data.dataset_name = "roses"
    out = _run(cfg, 64, 64)
    assert out["seg1"].shape == (1, 64, 64, 2)
    assert out["disp1"].shape == (1, 64, 64, 1)
    assert out["seg3"].shape == (1, 64, 64, 2)


def test_warp_disp_gt_input():
    cfg = PMTConfig()
    cfg.model.net = "dsnet_warp_disp"
    out = _run(cfg, 64, 64, disp_gt=jnp.ones((1, 64, 64, 1)))
    assert out["seg1"].shape == (1, 64, 64, 2)


def test_warp_disp_consist_returns_warped_image():
    cfg = PMTConfig()
    cfg.model.net = "dsnet_warp_disp_consist"
    out = _run(cfg, 64, 64)
    assert out["warped_right"].shape == (1, 64, 64, 3)


def test_seg_dsnet():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_seg"
    out = _run(cfg, 64, 64)
    assert out["seg1"].shape == (1, 64, 64, 2)
    assert out["warped_right"].shape == (1, 64, 64, 3)
