"""Winograd F(2x2,3x3) vs lax conv: exactness and AD agreement."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.ops.winograd import (
    winograd_conv3x3,
)


def _lax_conv(x, k, bias=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                     dimension_numbers=dn)
    return y if bias is None else y + bias


@pytest.mark.parametrize("shape", [(2, 8, 12, 16, 8), (1, 4, 6, 3, 5)])
def test_winograd_matches_lax_fp32(shape):
    n, h, w, cin, cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    ref = _lax_conv(x, k, b)
    out = winograd_conv3x3(x, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_winograd_matches_lax_bf16_scale():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 32, 32)), jnp.bfloat16)
    ref = _lax_conv(x.astype(jnp.float32), k.astype(jnp.float32))
    out = winograd_conv3x3(x, k).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    # bf16 has ~3 decimal digits; transforms add a couple of ulps
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 0.05


def test_winograd_grads_match_lax():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 3)), jnp.float32)

    def loss_w(x, k):
        return jnp.sum(winograd_conv3x3(x, k) ** 2)

    def loss_l(x, k):
        return jnp.sum(_lax_conv(x, k) ** 2)

    gw = jax.grad(loss_w, argnums=(0, 1))(x, k)
    gl = jax.grad(loss_l, argnums=(0, 1))(x, k)
    for a, b in zip(gw, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_winograd_odd_even_spatial_guard():
    x = jnp.zeros((1, 5, 6, 4), jnp.float32)
    k = jnp.zeros((3, 3, 4, 4), jnp.float32)
    with pytest.raises(AssertionError):
        winograd_conv3x3(x, k)


def test_flagship_s2d_wino_matches_dense(monkeypatch):
    """Full flagship forward: winograd s2d chains == dense s2d chains."""
    import jax
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
        PMTConfig,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.ops import (
        winograd,
    )

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    model = models.get_network(cfg)
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (1, 32, 64, 3), jnp.float32)
    right = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 64, 3),
                              jnp.float32)
    v = model.init({"params": key}, left, right, train=False)

    winograd.set_winograd(False)
    try:
        ref = model.apply(v, left, right, train=False)
        winograd.set_winograd(True)
        out = model.apply(v, left, right, train=False)
    finally:
        winograd.set_winograd(False)
    for name in ("seg1", "disp1", "seg2", "disp2"):
        r, o = np.asarray(ref[name]), np.asarray(out[name])
        scale = max(np.abs(r).max(), 1e-3)
        assert np.abs(o - r).max() / scale < 1e-4, name
