"""Space-to-depth decoder-head domain (ops/s2d.py, models/blocks.py SameConv/
PhaseBatchNorm): the s2d path must compute the SAME function as the plain
path — same variables, same outputs, same BN statistics — since it is a pure
TPU-layout optimization (full 128-lane MXU tiles for the reference's 32-64
channel full-resolution decoder chains, dsnet_t2.py:1199-1222/1259-1284).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
    PMTConfig,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.blocks import (
    Conv2DownUp,
    ConvBN,
    SameConv,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.ops.s2d import (
    depth_to_space,
    embed_kernel,
    s2d_concat,
    space_to_depth,
    tile_phases,
    to_s2d_nearest,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.ops.resize import (
    resize_nearest,
    upsample_nearest,
)


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_s2d_roundtrip(key):
    x = jax.random.normal(key, (2, 8, 12, 5))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


@pytest.mark.parametrize("k", [1, 3, 5])
def test_embedded_conv_exact(key, k):
    """d2s(conv3x3_embedded(s2d(x))) == conv_k(x) including borders."""
    c_in, c_out = 6, 7
    x = jax.random.normal(key, (2, 10, 14, c_in), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, c_in, c_out)) * 0.3
    dn = ("NHWC", "HWIO", "NHWC")
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(x.shape, w.shape, dn))
    xs = space_to_depth(x)
    ws = embed_kernel(w)
    got = depth_to_space(jax.lax.conv_general_dilated(
        xs, ws, (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(xs.shape, ws.shape,
                                                         dn)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_s2d_concat_and_tile(key):
    a = jax.random.normal(key, (1, 8, 8, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 2))
    got = s2d_concat([space_to_depth(a), space_to_depth(b)])
    ref = space_to_depth(jnp.concatenate([a, b], axis=-1))
    np.testing.assert_array_equal(got, ref)
    # tile_phases == s2d of a 2x nearest upsample
    np.testing.assert_array_equal(
        tile_phases(a), space_to_depth(upsample_nearest(a, 2)))


@pytest.mark.parametrize("factor", [2, 4, 8])
def test_to_s2d_nearest_even_factors(key, factor):
    x = jax.random.normal(key, (1, 6, 8, 3))
    target = (6 * factor, 8 * factor)
    np.testing.assert_array_equal(
        to_s2d_nearest(x, target), space_to_depth(resize_nearest(x, target)))


def test_conv2downup_s2d_matches_plain_train_and_eval(key):
    """Full hourglass block: outputs AND updated BN stats agree."""
    x = jax.random.normal(key, (2, 16, 24, 8), jnp.float32)
    m = Conv2DownUp(features=8, kernel=5)
    v = m.init({"params": key}, x, False)
    ref = m.apply(v, x, False)
    got = depth_to_space(m.apply(v, space_to_depth(x), False, s2d=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    ref_t, mut_ref = m.apply(v, x, True, mutable=["batch_stats"],
                             rngs={"dropout": key})
    got_t, mut_got = m.apply(v, space_to_depth(x), True, s2d=True,
                             mutable=["batch_stats"], rngs={"dropout": key})
    np.testing.assert_allclose(depth_to_space(got_t), ref_t,
                               rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        mut_ref["batch_stats"], mut_got["batch_stats"])


def test_sameconv_param_paths_match_nn_conv(key):
    """SameConv owns <name>/kernel + <name>/bias exactly like nn.Conv did —
    checkpoints from round 1 stay loadable."""
    x = jnp.ones((1, 8, 8, 3))
    m = ConvBN(features=4, kernel=3, batchnorm=True)
    v = m.init({"params": key}, x, False)
    assert set(v["params"].keys()) == {"conv", "bn"}
    assert set(v["params"]["conv"].keys()) == {"kernel"}
    assert v["params"]["conv"]["kernel"].shape == (3, 3, 3, 4)
    assert set(v["params"]["bn"].keys()) == {"scale", "bias"}
    assert set(v["batch_stats"]["bn"].keys()) == {"mean", "var"}
    m2 = ConvBN(features=4, kernel=3, batchnorm=False)
    v2 = m2.init({"params": key}, x, False)
    # bias-free like the reference's conv2dSame (torch_model.py:243) — the
    # fabricated zero bias was removed in round 3 for trajectory parity
    assert set(v2["params"]["conv"].keys()) == {"kernel"}


def test_flagship_s2d_matches_plain(key):
    """MiniDSNetExt with s2d_heads on/off: same variables -> same outputs.

    Tolerance is loose-relative: random He-init weights on unnormalized
    random inputs amplify fp32 roundoff; an fp64 oracle shows both paths
    ~1.2e-6 relative from the true value (see round-2 notes)."""
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg2 = PMTConfig()
    cfg2.model.net = "sdnet_mini_ext"
    cfg2.model.s2d_heads = False
    m_on = models.get_network(cfg)
    m_off = models.get_network(cfg2)
    l = jax.random.normal(key, (1, 32, 48, 3), jnp.float32) * 0.5
    r = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 48, 3)) * 0.5
    v = jax.jit(lambda: m_on.init({"params": key}, l, r, train=False))()
    o_on = jax.jit(lambda: m_on.apply(v, l, r, train=False))()
    o_off = jax.jit(lambda: m_off.apply(v, l, r, train=False))()
    # init under the plain path creates the identical tree
    v2 = jax.jit(lambda: m_off.init({"params": key}, l, r, train=False))()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), v, v2)
    for h in ("seg1", "seg2", "disp1"):
        scale = float(jnp.max(jnp.abs(o_off[h]))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(o_on[h]) / scale, np.asarray(o_off[h]) / scale,
            atol=5e-4, err_msg=h)


def test_sameconv_1x1_s2d_per_phase_matmul(key):
    """1x1 convs must take the per-phase matmul path (block-diagonal over
    phases — embedding one as a dense 3x3 kernel inflates FLOPs 36x) and
    still equal the plain conv exactly."""
    x = jax.random.normal(key, (2, 8, 12, 5), jnp.float32)
    m = SameConv(features=7, kernel=(1, 1))
    v = m.init({"params": key}, x)
    ref = m.apply(v, x)
    got = depth_to_space(m.apply(v, space_to_depth(x), s2d=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
