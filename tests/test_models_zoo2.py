"""Shape tests: legacy dsnet/dsnetv2, ext_small family, ext variants,
ext_dlab, hanet. Completes the 17-net FUNCTION_MAP coverage
(util/utilLoadNetwork.py:8-26)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig
from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models


def _run(cfg, h=64, w=64, **kwargs):
    model = models.get_network(cfg)
    left = jnp.zeros((1, h, w, 3), jnp.float32)
    right = jnp.zeros((1, h, w, 3), jnp.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, left, right,
                    train=False, **kwargs)
    return model.apply(vs, left, right, train=False, **kwargs)


def test_all_17_nets_registered():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core.config import (
        VALID_NETS,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core.registry import (
        MODELS,
    )

    missing = [n for n in VALID_NETS if n not in MODELS]
    assert not missing, f"unregistered nets: {missing}"


def test_dsnet_legacy():
    cfg = PMTConfig()
    cfg.model.net = "sdnet"
    out = _run(cfg, 64, 64)
    assert out["seg1"].shape == (1, 64, 64, 2)
    assert out["disp2"].shape == (1, 64, 64, 1)


def test_dsnetv2():
    cfg = PMTConfig()
    cfg.model.net = "sdnetv2"
    cfg.model.corr_type = "1dcorr"
    out = _run(cfg, 64, 64)
    assert out["seg2"].shape == (1, 64, 64, 2)


def test_ext_small_v0():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext_small"
    out = _run(cfg, 64, 64)
    assert out["seg1"].shape == (1, 64, 64, 2)
    assert out["disp1"].shape == (1, 64, 64, 1)


def test_ext_small_edge():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext_small_edge"
    # left_e = grad-mag of the RGB image keeps 3 channels; the edge head is
    # built with labels=1 (segNet(..., 1, 1), dsnet_t2_ext_small.py:245)
    out = _run(cfg, 64, 64, left_e=jnp.zeros((1, 64, 64, 3)))
    assert out["edge"].shape == (1, 64, 64, 1)
    assert out["seg1"].shape == (1, 64, 64, 2)


def test_ext_small_v2():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext_small_edgev2"
    out = _run(cfg, 64, 64, left_e=jnp.zeros((1, 64, 64, 1)))
    assert out["seg2"].shape == (1, 64, 64, 2)


@pytest.mark.parametrize(
    "net", ["sdnet_mini_ext_v2", "sdnet_mini_ext_piramid",
            "sdnet_mini_ext_piramid_res"]
)
def test_ext_variants(net):
    cfg = PMTConfig()
    cfg.model.net = net
    out = _run(cfg, 32, 64)
    assert out["seg2"].shape == (1, 32, 64, 2)
    assert out["disp1"].shape == (1, 32, 64, 1)


def test_ext_dlab():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext_dlab"
    out = _run(cfg, 32, 64)
    assert out["seg2"].shape == (1, 32, 64, 2)


def test_ext_dlab_hanet_resnet3x3_stem():
    """The dlab trunk must use HANet's ResNet3X3 stem — three 3x3 convs
    (64, 64, 128) — not the torchvision 7x7 stem, so HANet checkpoints
    import by name (models_hanet/Resnet.py:149-158)."""
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext_dlab"
    model = models.get_network(cfg)
    left = jnp.zeros((1, 32, 64, 3), jnp.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, left, left,
                    train=False)
    trunk = vs["params"]["features"]["trunk"]
    assert trunk["conv1"]["kernel"].shape == (3, 3, 3, 64)
    assert trunk["conv2"]["kernel"].shape == (3, 3, 64, 64)
    assert trunk["conv3"]["kernel"].shape == (3, 3, 64, 128)
    # variant 'D': plain blocks in layer4 (no multi-grid naming)
    assert "layer4_block0" in trunk and "layer4_block2" in trunk


def test_hanet_attention():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.hanet import (
        HANetConv,
        adaptive_pool_rows,
        sinusoid_table,
    )

    x = jnp.ones((1, 32, 64, 64))  # low-level features
    out = jnp.ones((1, 64, 128, 2))
    pos_h = jnp.tile(jnp.arange(1024)[None, :, None] // 8, (1, 1, 16))
    pos_w = jnp.zeros((1, 1024, 16), jnp.int32)
    m = HANetConv(out_channels=2, pooling="max", pos_rfactor=2)
    vs = m.init(jax.random.PRNGKey(0), x, out, (pos_h, pos_w))
    gated, att = m.apply(vs, x, out, (pos_h, pos_w))
    assert gated.shape == out.shape
    assert att.shape == (1, 64, 2)

    pooled = adaptive_pool_rows(jnp.ones((1, 100, 7, 3)), 64, "mean")
    assert pooled.shape == (1, 64, 3)
    tab = sinusoid_table(65, 4)
    assert tab.shape == (65, 4)


def test_flagship_with_hanet():
    cfg = PMTConfig()
    cfg.model.hanet = True
    model = models.get_network(cfg)
    left = jnp.zeros((1, 32, 64, 3))
    h = jnp.tile(jnp.arange(1024)[None, :, None] // 8, (1, 1, 8))
    w = jnp.zeros((1, 1024, 8), jnp.int32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, left, left,
                    train=False, pos=(h, w))
    out = model.apply(vs, left, left, train=False, pos=(h, w))
    assert out["seg2"].shape == (1, 32, 64, 2)


def test_efficientnet_b2_endpoints():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core.registry import (
        BACKBONES,
    )

    m = BACKBONES.get("efficientnet-b2")()
    x = jnp.zeros((1, 64, 64, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    eps = m.apply(vs, x)
    # reference channel comments (dsnet_t2.py:1974-1981):
    # (16@/2, 24@/4, 48@/8, 120@/16, 1408@/32)
    assert [e.shape[-1] for e in eps] == [16, 24, 48, 120, 1408]
    assert [e.shape[1] for e in eps] == [32, 16, 8, 4, 2]


def test_flagship_efficientnet_backbone():
    cfg = PMTConfig()
    cfg.model.backbone = "efficientnet-b2"
    out = _run(cfg, 32, 64)
    assert out["seg2"].shape == (1, 32, 64, 2)
