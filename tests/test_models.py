"""Shape/structure tests for the model zoo (CPU, small crops)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
    PMTConfig,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models


def _init_and_run(model, shapes=(1, 64, 128, 3), **kwargs):
    rng = jax.random.PRNGKey(0)
    left = jnp.zeros(shapes, jnp.float32)
    right = jnp.zeros(shapes, jnp.float32)
    variables = model.init({"params": rng}, left, right, train=False, **kwargs)
    out = model.apply(variables, left, right, train=False, **kwargs)
    return variables, out


def test_densenet121_tap_shapes():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.densenet import (
        densenet121,
        DENSENET_TAP_CHANNELS,
    )

    m = densenet121()
    x = jnp.zeros((1, 64, 128, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    taps = m.apply(vs, x)
    assert len(taps) == 5
    # strides /2 /4 /8 /16 /32 — dsnet_t2.py:1898-1906 comment
    for i, (tap, ch) in enumerate(zip(taps, DENSENET_TAP_CHANNELS["densenet"])):
        s = 2 ** (i + 1)
        assert tap.shape == (1, 64 // s, 128 // s, ch), (i, tap.shape)


def test_mobilenetv3_tap_shapes():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.mobilenetv3 import (
        mobilenetv3_large,
        MOBILENET_TAP_CHANNELS,
    )

    m = mobilenetv3_large()
    x = jnp.zeros((1, 64, 128, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    taps = m.apply(vs, x)
    for i, (tap, ch) in enumerate(zip(taps, MOBILENET_TAP_CHANNELS)):
        s = 2 ** (i + 1)
        assert tap.shape == (1, 64 // s, 128 // s, ch), (i, tap.shape)


def test_resnet50_deeplab_tap_shapes():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.resnet_deeplab import (
        resnet50_deeplab,
        RESNET_TAP_CHANNELS,
    )

    m = resnet50_deeplab()
    x = jnp.zeros((1, 64, 64, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    taps = m.apply(vs, x)
    # output_stride 16: /2 /4 /8 /16 /16 (resnet_deeplab.py:51-53)
    strides = (2, 4, 8, 16, 16)
    for tap, ch, s in zip(taps, RESNET_TAP_CHANNELS, strides):
        assert tap.shape == (1, 64 // s, 64 // s, ch), tap.shape


def test_pyramidnet2_output_channels():
    m = models.PiramidNet2(backbone="densenet")
    x = jnp.zeros((1, 64, 128, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    o0, o1, o2, o3, o4, b2, b1, b0 = m.apply(vs, x)
    # enriched maps: tap + 32ch per branch (dsnet_t2.py:2043-2081)
    assert b0.shape[-1] == 64 + 5 * 32  # 224
    assert b1.shape[-1] == 128 + 4 * 32  # 256
    assert b2.shape[-1] == 256 + 3 * 32  # 352
    assert b2.shape[1:3] == o2.shape[1:3]


def test_minidsnetext_flagship_shapes():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    cfg.data.dataset_name = "roses"
    model = models.get_network(cfg)
    _, out = _init_and_run(model, (1, 64, 128, 3))
    assert out["seg1"].shape == (1, 64, 128, 2)
    assert out["seg2"].shape == (1, 64, 128, 2)
    assert out["disp1"].shape == (1, 64, 128, 1)


def test_minidsnetext_2dcorr_and_no_att():
    cfg = PMTConfig()
    cfg.model.corr_type = "2dcorr"
    cfg.model.use_att = False
    model = models.get_network(cfg)
    _, out = _init_and_run(model, (1, 32, 64, 3))
    assert out["seg2"].shape == (1, 32, 64, 2)


def test_minidsnetext_ablations():
    cfg = PMTConfig()
    cfg.model.ablation = ("no_dec1", "no_dec3")
    model = models.get_network(cfg)
    _, out = _init_and_run(model, (1, 32, 64, 3))
    assert out["seg2"].shape == (1, 32, 64, 2)


def test_minidsnetext_conv_deconv_out():
    cfg = PMTConfig()
    cfg.model.conv_deconv_out = 2
    model = models.get_network(cfg)
    _, out = _init_and_run(model, (1, 32, 64, 3))
    assert out["seg2"].shape == (1, 32, 64, 2)


def test_minidsnetext_mobilenet_backbone():
    cfg = PMTConfig()
    cfg.model.backbone = "mobilenet"
    model = models.get_network(cfg)
    _, out = _init_and_run(model, (1, 32, 64, 3))
    assert out["seg2"].shape == (1, 32, 64, 2)


def test_minidsnet_small():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    model = models.get_network(cfg)
    _, out = _init_and_run(model, (1, 32, 64, 3))
    # smallOutPair: heads duplicated (dsnet_t2.py:912)
    assert out["seg1"] is out["seg2"]
    assert out["disp1"].shape == (1, 32, 64, 1)


def test_multitask_mode1():
    cfg = PMTConfig()
    cfg.model.multaskloss = 1
    model = models.get_network(cfg)
    left = jnp.zeros((1, 32, 64, 3))
    disp_gt = jnp.zeros((1, 32, 64, 1))
    seg_labels = jnp.zeros((1, 32, 64), jnp.int32)
    vs = model.init(
        jax.random.PRNGKey(0), left, left, train=False,
        disp_gt=disp_gt, seg_labels=seg_labels,
    )
    out = model.apply(vs, left, left, train=False, disp_gt=disp_gt,
                      seg_labels=seg_labels)
    assert "mt" in out and len(out["mt"]) == 3
    assert "log_var_disp" in vs["params"]


def test_train_mode_updates_batch_stats():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    model = models.get_network(cfg)
    left = jnp.ones((2, 32, 64, 3))
    vs = model.init(jax.random.PRNGKey(0), left, left, train=False)
    out, mutated = model.apply(
        vs, left, left, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
