"""Edge / gradient ops used by the edge-input models and the GSCNN-style
dual-task loss.

Reproduces util/utilTorchGate.py behavior exactly, including its quirk:
``convTri`` early-returns its input (utilTorchGate.py:123), so
``compute_grad_mag`` is simply the central-difference gradient magnitude of
the raw input with zero-padding at the borders, optionally normalized by its
max. NHWC layout.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _central_diff_x(x: jnp.ndarray) -> jnp.ndarray:
    """(v[x+1] - v[x-1]) * 0.5 with zero padding (conv2d_same + kernel
    [-0.5, 0, 0.5], utilTorchGate.py:68-82)."""
    p = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return (p[:, :, 2:, :] - p[:, :, :-2, :]) * 0.5


def _central_diff_y(x: jnp.ndarray) -> jnp.ndarray:
    p = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return (p[:, 2:, :, :] - p[:, :-2, :, :]) * 0.5


def numerical_gradients_2d(x: jnp.ndarray):
    """Central differences over NHWC; returns (gx, gy)."""
    return _central_diff_x(x), _central_diff_y(x)


def compute_grad_mag(x: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """utilTorchGate.compute_grad_mag: sqrt(gx^2+gy^2+1e-6), optionally
    divided by its global max. NHWC in/out."""
    gx, gy = numerical_gradients_2d(x)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-6)
    if normalize:
        mag = mag / jnp.max(mag)
    return mag


def gauss2d_kernel(size: int = 7, sigma: float = 2.0) -> np.ndarray:
    """MATLAB fspecial('gaussian') clone (utilTorchLoss.py:8-20)."""
    m = (size - 1.0) / 2.0
    y, x = np.ogrid[-m : m + 1, -m : m + 1]
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    s = h.sum()
    if s != 0:
        h /= s
    return h.astype(np.float32)


def gaussian_smooth(x: jnp.ndarray, size: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Depthwise gaussian blur with zero 'same' padding, NHWC."""
    import jax

    k = jnp.asarray(gauss2d_kernel(size, sigma))
    c = x.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, depthwise
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=[(size // 2, size // 2), (size // 2, size // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def box_count(x: jnp.ndarray, size: int, padding: str = "VALID") -> jnp.ndarray:
    """Depthwise all-ones conv (box filter) — used by the area losses and the
    smoothness intra-segment mask (utilTorchLoss.py:55-57, 472-475). NHWC."""
    import jax

    c = x.shape[-1]
    kern = jnp.ones((size, size, 1, c), x.dtype)
    if padding == "SAME_ZERO":
        pad = [(size // 2, size // 2), (size // 2, size // 2)]
    else:
        pad = padding
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def sobel_edges(gray: np.ndarray) -> np.ndarray:
    """Host-side sobel magnitude > 0 binary edge map, matching
    skimage.filters.sobel on the instance map (utilTorchDataLoader.py:152-155).
    Pure numpy (runs in the input pipeline, not on device)."""
    g = gray.astype(np.float64)
    # skimage sobel kernels (normalized by 4). skimage/scipy 'reflect'
    # duplicates the edge sample == np.pad mode='symmetric'.
    p = np.pad(g, 1, mode="symmetric")
    gx = (
        (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])
    ) / 4.0
    gy = (
        (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])
    ) / 4.0
    mag = np.sqrt(gx * gx + gy * gy) / np.sqrt(2.0)
    return (mag > 0).astype(np.float32)
