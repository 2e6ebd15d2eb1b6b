"""EncoderDecoderNet (UNet hypercolumn, SCSE/SEIBN/OC decoders) tests."""
import jax
import jax.numpy as jnp
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.encdec import (
    EncoderDecoderNet,
    SCSEBlock,
    BaseOC,
)


@pytest.mark.parametrize("dec", ["unet_scse", "unet_seibn", "unet_oc"])
def test_encdec_decoders(dec):
    m = EncoderDecoderNet(labels=19, dec_type=dec)
    x = jnp.zeros((1, 64, 64, 3))
    vs = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(vs, x, train=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["seg1"].shape == (1, 64, 64, 19)  # d1 back at input res


def test_scse_block_shape():
    m = SCSEBlock()
    x = jnp.ones((2, 8, 8, 32))
    vs = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(vs, x).shape == x.shape


def test_base_oc_attention():
    m = BaseOC(out_channels=32)
    x = jnp.ones((1, 8, 8, 64))
    vs = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(vs, x, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (1, 8, 8, 32)


@pytest.mark.parametrize("enc", ["resnet18", "resnet34", "resnet152"])
def test_encdec_basicblock_and_deep_encoders(enc):
    """The torchvision resnets create_encoder actually reaches
    (encoder.py:17-36): BasicBlock 18/34 (expansion 1, identity layer1
    skip) and Bottleneck 152 — resnext/senet are dead in the reference
    (encoder.py:3 pretrainedmodels import commented out)."""
    m = EncoderDecoderNet(labels=5, enc_type=enc)
    x = jnp.zeros((1, 64, 64, 3))
    vs = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(vs, x, train=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["seg1"].shape == (1, 64, 64, 5)
    if enc == "resnet18":
        # layer1 BasicBlocks must have identity skips (no down projection)
        p = vs["params"]
        assert "down" not in p["l1_b0"], "resnet18 layer1 must not project"
