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
