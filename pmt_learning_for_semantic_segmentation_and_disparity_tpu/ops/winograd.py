"""Winograd F(2x2, 3x3) convolution for the s2d-domain decoder chains.

Every conv in the space-to-depth execution domain (ops/s2d.py) is a 3x3
stride-1 SAME conv after ``embed_kernel`` (original 5x5/3x3 kernels embed
into 3x3 over 4x channels). Those convs carry roughly half of the flagship
inference FLOPs (tools/sol_inference.py: 17.9 TF at b16 512x960, of which
the s2d domain inflation alone is 5.7 TF), so the direct conv's arithmetic
is the headline cost.

Winograd F(2x2,3x3) computes the same conv with 2.25x fewer MACs:
each 2x2 output tile needs 16 multiplies (one per transform tap) instead
of 36. On TPU the 16 taps become 16 independent (rows, Cin) x (Cin, Cout)
matmuls — full 128-lane MXU shapes at the s2d chains' 256-channel widths —
and the input/output transforms are +/- adds that XLA fuses.

Exactness: the function equals lax.conv_general_dilated up to fp
reassociation (transform matrices are 0/±1/±1/2 — all exact in binary fp;
only the contraction order changes). tests/test_winograd.py pins fp32
agreement at 1e-5 and bf16 agreement at bf16-roundoff scale.

No reference analogue — the torch reference runs cuDNN's implicit-GEMM
(models/dsnet_t2.py decoder chains); this is the TPU-native equivalent of
cuDNN's own Winograd path.

STATUS — measured and RETIRED (round 5, BENCH_NOTES "Winograd measured
and retired"): this XLA-einsum formulation materializes the 16x tile
tensor and its transform in HBM, so it is bandwidth-bound — 0.12x/0.33x
vs the dense conv at the flagship shapes and OOM at the concat shape.
The flag stays OFF; a competitive version needs a Pallas kernel that
keeps the per-block transforms in VMEM. Kept because it is exact,
tested, and documents the exploration.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

# Trace-time switch for the s2d decoder chains (models/blocks.py SameConv):
# default from PMT_S2D_WINO, overridable programmatically. Winograd equals
# the direct conv up to fp reassociation, so parity/quality is unchanged at
# fp32; the bf16 delta is quality-probed in BENCH_NOTES before any default
# flip.
_ENABLED = os.environ.get("PMT_S2D_WINO", "0") != "0"


def winograd_enabled() -> bool:
    return _ENABLED


def set_winograd(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)

# F(2x2, 3x3) transform matrices (Lavin & Gray 2016, arXiv:1509.09308).
_BT = np.array(
    [[1, 0, -1, 0],
     [0, 1, 1, 0],
     [0, -1, 1, 0],
     [0, 1, 0, -1]], np.float32)
_G = np.array(
    [[1, 0, 0],
     [0.5, 0.5, 0.5],
     [0.5, -0.5, 0.5],
     [0, 0, 1]], np.float32)
_AT = np.array(
    [[1, 1, 1, 0],
     [0, 1, -1, -1]], np.float32)


def transform_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> Winograd-domain (4,4,Cin,Cout): U = G g G^T."""
    assert kernel.shape[:2] == (3, 3), kernel.shape
    g = jnp.asarray(_G, kernel.dtype)
    return jnp.einsum("ai,bj,ijco->abco", g, g, kernel)


def winograd_conv3x3(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv via Winograd F(2x2,3x3).

    x: (N, H, W, Cin) with H, W even (s2d-domain tensors always are).
    kernel: (3, 3, Cin, Cout). Returns (N, H, W, Cout) in x.dtype's
    result type. The 16 tap matmuls run in the input dtype (bf16 stays
    on the fast MXU path, f32 accumulation as usual); the +/- transforms
    are exact in fp.
    """
    n, h, w, cin = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    cout = kernel.shape[-1]
    th, tw = h // 2, w // 2

    dt = x.dtype
    bt = jnp.asarray(_BT, dt)
    at = jnp.asarray(_AT, dt)

    u = transform_kernel(kernel)  # (4,4,Cin,Cout)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # overlapping 4x4 tiles at stride 2: d[a,b][n,i,j,c] = xp[n, 2i+a, 2j+b, c]
    rows = [xp[:, a : a + h - 1 : 2] for a in range(4)]
    d = jnp.stack(
        [jnp.stack([r[:, :, b : b + w - 1 : 2] for b in range(4)], axis=1)
         for r in rows],
        axis=1,
    )  # (N, 4, 4, th, tw, Cin)

    # V = B^T d B over the two tile axes (0/±1 entries -> fused adds)
    v = jnp.einsum("ai,bj,nijhwc->nabhwc", bt, bt, d)
    # 16 independent full-width matmuls
    m = jnp.einsum("nabhwc,abco->nabhwo", v, u.astype(dt))
    # Y = A^T M A, then interleave the 2x2 tile outputs into H, W
    y = jnp.einsum("pa,qb,nabhwo->nhpwqo", at, at, m)
    y = y.reshape(n, h, w, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
