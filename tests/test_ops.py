import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import ops


# ---------------------------------------------------------------------------
# resize parity vs torch
# ---------------------------------------------------------------------------


def _torch_interp(x_nhwc, size=None, scale=None, mode="nearest", ac=False):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    kwargs = {}
    if mode == "bilinear":
        kwargs["align_corners"] = ac
    out = F.interpolate(t, size=size, scale_factor=scale, mode=mode, **kwargs)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("size", [(16, 24), (7, 13), (64, 96), (33, 65)])
def test_resize_nearest_matches_torch(rng, size):
    x = rng.standard_normal((2, 32, 48, 3), dtype=np.float32)
    ref = _torch_interp(x, size=size, mode="nearest")
    got = np.asarray(ops.resize_nearest(jnp.asarray(x), size))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


@pytest.mark.parametrize("size", [(16, 24), (64, 96), (30, 50)])
def test_resize_bilinear_matches_torch(rng, size):
    x = rng.standard_normal((2, 32, 48, 3), dtype=np.float32)
    ref = _torch_interp(x, size=size, mode="bilinear", ac=False)
    got = np.asarray(ops.resize_bilinear(jnp.asarray(x), size))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("size", [(16, 24), (65, 97)])
def test_resize_bilinear_align_corners_matches_torch(rng, size):
    x = rng.standard_normal((2, 32, 48, 3), dtype=np.float32)
    ref = _torch_interp(x, size=size, mode="bilinear", ac=True)
    got = np.asarray(ops.resize_bilinear_align_corners(jnp.asarray(x), size))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_upsample_nearest_factor8(rng):
    x = rng.standard_normal((1, 4, 6, 2), dtype=np.float32)
    ref = _torch_interp(x, scale=8, mode="nearest")
    got = np.asarray(ops.upsample_nearest(jnp.asarray(x), 8))
    np.testing.assert_array_equal(got, ref)


def test_avg_pool_matches_torch(rng):
    import torch

    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = torch.nn.AvgPool2d(8, 8)(t).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(ops.avg_pool(jnp.asarray(x), 8, 8))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# correlation
# ---------------------------------------------------------------------------


def _corr_numpy(f1, f2, patch):
    """Brute-force reference of SpatialCorrelationSampler(k=1, patch, pad=0)."""
    ph, pw = patch
    b, h, w, c = f1.shape
    rh, rw = ph // 2, pw // 2
    out = np.zeros((b, h, w, ph * pw), np.float32)
    f2p = np.pad(f2, ((0, 0), (rh, rh), (rw, rw), (0, 0)))
    for i in range(ph):
        for j in range(pw):
            out[..., i * pw + j] = np.sum(
                f1 * f2p[:, i : i + h, j : j + w, :], axis=-1
            )
    return out


def test_correlation_lax_1d(rng):
    f1 = rng.standard_normal((2, 8, 16, 12), dtype=np.float32)
    f2 = rng.standard_normal((2, 8, 16, 12), dtype=np.float32)
    ref = _corr_numpy(f1, f2, (1, 17))
    got = np.asarray(ops.correlation_lax(jnp.asarray(f1), jnp.asarray(f2), (1, 17)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_correlation_lax_2d_normalized(rng):
    f1 = rng.standard_normal((1, 6, 10, 8), dtype=np.float32)
    f2 = rng.standard_normal((1, 6, 10, 8), dtype=np.float32)
    ref = _corr_numpy(f1, f2, (5, 5)) / 8.0
    got = np.asarray(
        ops.correlation_lax(jnp.asarray(f1), jnp.asarray(f2), (5, 5), normalize=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_correlation_pallas_interpret_matches_lax(rng):
    f1 = rng.standard_normal((2, 8, 16, 12), dtype=np.float32)
    f2 = rng.standard_normal((2, 8, 16, 12), dtype=np.float32)
    ref = _corr_numpy(f1, f2, (1, 17))
    got = np.asarray(
        ops.correlation1d_pallas(jnp.asarray(f1), jnp.asarray(f2), 17, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_correlation_matches_torch_sampler_semantics(rng):
    """Cross-check displacement ordering against a literal torch unfold impl."""
    import torch

    f1 = rng.standard_normal((1, 5, 9, 4), dtype=np.float32)
    f2 = rng.standard_normal((1, 5, 9, 4), dtype=np.float32)
    t1 = torch.from_numpy(np.transpose(f1, (0, 3, 1, 2)))
    t2 = torch.from_numpy(np.transpose(f2, (0, 3, 1, 2)))
    pw = 5
    rw = pw // 2
    t2p = torch.nn.functional.pad(t2, (rw, rw, 0, 0))
    ref = torch.stack(
        [(t1 * t2p[:, :, :, j : j + 9]).sum(1) for j in range(pw)], dim=1
    )  # (B, pw, H, W) == sampler output squeezed at dim 1
    got = np.asarray(ops.correlation_lax(jnp.asarray(f1), jnp.asarray(f2), (1, pw)))
    np.testing.assert_allclose(
        np.transpose(got, (0, 3, 1, 2)), ref.numpy(), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# warp
# ---------------------------------------------------------------------------


def test_apply_disparity_identity(rng):
    img = rng.standard_normal((1, 4, 8, 3), dtype=np.float32)
    out = np.asarray(ops.apply_disparity(jnp.asarray(img), jnp.zeros((1, 4, 8))))
    # reference quirk (torch_dsnet.py:52-81): x1 is clamped before
    # weight_l = x1 - x, so the exact right-edge coordinate samples to zero
    np.testing.assert_allclose(out[:, :, :-1], img[:, :, :-1],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out[:, :, -1], 0.0, atol=1e-6)


def test_apply_disparity_integer_shift(rng):
    img = rng.standard_normal((1, 2, 8, 1), dtype=np.float32)
    off = np.full((1, 2, 8), 2.0, np.float32)
    out = np.asarray(ops.apply_disparity(jnp.asarray(img), jnp.asarray(off)))
    # interior pixels: out[x] = img[x+2]
    np.testing.assert_allclose(out[0, :, :5, 0], img[0, :, 2:7, 0], atol=1e-6)


def test_apply_disparity_fractional(rng):
    img = np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1)
    off = np.full((1, 1, 8), 0.5, np.float32)
    out = np.asarray(ops.apply_disparity(jnp.asarray(img), jnp.asarray(off)))
    np.testing.assert_allclose(out[0, 0, :6, 0], np.arange(6) + 0.5, atol=1e-6)


# ---------------------------------------------------------------------------
# edges
# ---------------------------------------------------------------------------


def test_compute_grad_mag_matches_manual(rng):
    x = rng.standard_normal((1, 8, 8, 1), dtype=np.float32)
    got = np.asarray(ops.compute_grad_mag(jnp.asarray(x), normalize=False))
    p = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gx = (p[:, 1:-1, 2:] - p[:, 1:-1, :-2]) * 0.5
    gy = (p[:, 2:, 1:-1] - p[:, :-2, 1:-1]) * 0.5
    ref = np.sqrt(gx * gx + gy * gy + 1e-6)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_sobel_edges_matches_scipy(rng):
    # skimage (the reference's dep) isn't in this image; scipy's sobel with
    # reflect boundary and /4 normalization is the same operator.
    from scipy import ndimage

    g = rng.random((16, 16)).astype(np.float64)
    gx = ndimage.sobel(g, axis=1, mode="reflect") / 4.0
    gy = ndimage.sobel(g, axis=0, mode="reflect") / 4.0
    ref = (np.sqrt(gx * gx + gy * gy) / np.sqrt(2.0) > 0) * 1.0
    got = ops.sobel_edges(g)
    np.testing.assert_array_equal(got, ref)


def test_box_count(rng):
    x = np.ones((1, 6, 6, 2), np.float32)
    out = np.asarray(ops.box_count(jnp.asarray(x), 3, padding="VALID"))
    assert out.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(out, 9.0)


def test_correlation_custom_vjp_matches_lax_grad(rng):
    """Pallas-forward correlation's analytic VJP vs autodiff of the lax
    reference implementation."""
    f1 = jnp.asarray(rng.standard_normal((1, 4, 10, 6), dtype=np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 4, 10, 6), dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((1, 4, 10, 5), dtype=np.float32))

    def loss_custom(a, b):
        return jnp.sum(ops.correlation(a, b, (1, 5)) * g)

    def loss_lax(a, b):
        return jnp.sum(ops.correlation_lax(a, b, (1, 5)) * g)

    g1c, g2c = jax.grad(loss_custom, argnums=(0, 1))(f1, f2)
    g1l, g2l = jax.grad(loss_lax, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(g1c), np.asarray(g1l), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2c), np.asarray(g2l), atol=1e-5)


def test_upsampled_soft_argmin_matches_naive(rng):
    """Fused chunked regression == materialize-then-softmax reference."""
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.ops.costvolume import (
        soft_argmin,
        upsampled_soft_argmin,
    )

    b, d4, h4, w4 = 1, 12, 8, 10
    maxd, oh, ow = 48, 32, 40
    cost = jnp.asarray(rng.standard_normal((b, d4, h4, w4), dtype=np.float32))
    naive = jax.image.resize(cost, (b, maxd, oh, ow), method="linear",
                             antialias=False)
    ref = soft_argmin(naive, maxd)
    got = upsampled_soft_argmin(cost, maxd, (oh, ow), chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_correlation2d_pallas_interpret_matches_lax(rng):
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.ops.correlation import (
        correlation2d_pallas,
    )

    f1 = rng.standard_normal((2, 8, 12, 6), dtype=np.float32)
    f2 = rng.standard_normal((2, 8, 12, 6), dtype=np.float32)
    ref = _corr_numpy(f1, f2, (5, 5)) / 6.0
    got = np.asarray(
        correlation2d_pallas(jnp.asarray(f1), jnp.asarray(f2), (5, 5),
                             normalize=True, h_tile=4, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_correlation2d_custom_vjp_matches_lax_grad(rng):
    f1 = jnp.asarray(rng.standard_normal((1, 6, 8, 4), dtype=np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 6, 8, 4), dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((1, 6, 8, 9), dtype=np.float32))

    def loss_custom(a, b):
        return jnp.sum(ops.correlation(a, b, (3, 3), normalize=True) * g)

    def loss_lax(a, b):
        return jnp.sum(
            ops.correlation(a, b, (3, 3), normalize=True, use_pallas=False) * g
        )

    g1c, g2c = jax.grad(loss_custom, argnums=(0, 1))(f1, f2)
    g1l, g2l = jax.grad(loss_lax, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(g1c), np.asarray(g1l), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2c), np.asarray(g2l), atol=1e-5)
