"""HANet height-driven attention (flax, NHWC).

Reference: models_hanet/HANet.py:9-128 + PosEmbedding.py:49-85. Row-pools
the low-level feature map to a 128/pos_rfactor-length column, runs a 1-3
layer 1-D conv stack with an additive sinusoidal row-position encoding,
and multiplies the sigmoid height-attention onto the seg logits. Used by
minidsnetExt when -hanet 1 (dsnet_t2.py:1135-1137, 1288-1289); the driver
supplies coordinate grids (torch_implementation.py:138-144).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn

from .blocks import bn_train_mode
import jax
import jax.numpy as jnp
import numpy as np


def sinusoid_table(n_position: int, dim: int) -> np.ndarray:
    """Standard transformer sinusoid table (PosEmbedding.py get_sinusoid_
    encoding_table); HANet adds +1 (PosEmbedding.py:55)."""
    def angle(pos, i):
        return pos / np.power(10000, 2 * (i // 2) / dim)

    tab = np.array(
        [[angle(p, i) for i in range(dim)] for p in range(n_position)],
        dtype=np.float32,
    )
    tab[:, 0::2] = np.sin(tab[:, 0::2])
    if dim > 1:
        tab[:, 1::2] = np.cos(tab[:, 1::2])
    return tab + 1.0


def build_pos_grid(h: int, w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Driver-side HANet row/col coordinate grids
    (torch_implementation.py:138-144): FIXED 1024x2048 index grids divided
    by 8/16 (giving 0..127), independent of the actual input size — the
    reference always builds the cityscapes-resolution grid. Only column 0 of
    pos_h (and row 0 of pos_w) is ever consumed (PosEmbedding.py:66), so we
    return broadcastable (1, 1024, 1) / (1, 1, 2048) grids instead of
    materializing (B, 1024, 2048).
    """
    del h, w  # reference ignores the input resolution here
    pos_h = (jnp.arange(1024, dtype=jnp.int32) // 8)[None, :, None]
    pos_w = (jnp.arange(2048, dtype=jnp.int32) // 16)[None, None, :]
    return pos_h, pos_w


def adaptive_pool_rows(x: jnp.ndarray, out_len: int, mode: str = "max") -> jnp.ndarray:
    """AdaptiveAvg/MaxPool2d((out_len, 1)) on NHWC -> (B, out_len, C)."""
    b, h, w, c = x.shape
    # pool W fully first
    xw = jnp.max(x, axis=2) if mode == "max" else jnp.mean(x, axis=2)  # (B,H,C)
    outs = []
    for i in range(out_len):
        s = (i * h) // out_len
        e = max(-(-((i + 1) * h) // out_len), s + 1)
        seg = xw[:, s:e]
        outs.append(jnp.max(seg, axis=1) if mode == "max" else jnp.mean(seg, axis=1))
    return jnp.stack(outs, axis=1)  # (B, out_len, C)


def _interp1d_linear(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) over axis 1.
    x: (B, L, C)."""
    b, l, c = x.shape
    return jax.image.resize(x, (b, out_len, c), method="linear", antialias=False)


class HANetConv(nn.Module):
    """HANet_Conv with the reference defaults used by minidsnetExt
    (in from x's channels, out=labels, k=3, r_factor=64, layer=3,
    pos_injection=2, is_encoding=1)."""

    out_channels: int
    kernel: int = 3
    r_factor: int = 64
    layer: int = 3
    pos_rfactor: int = 2
    pooling: str = "max"
    dropout_prob: float = 0.0
    pos_injection: int = 2
    # is_encoding=1: frozen sinusoid table (PosEncoding1D,
    # PosEmbedding.py:49-85); 0: learned embedding (PosEmbedding1D,
    # PosEmbedding.py:88-120).
    is_encoding: int = 1
    # train-time gaussian jitter of the row index, clamped to
    # +-16//pos_rfactor then to the table range (PosEmbedding.py:62-67).
    pos_noise: float = 0.0

    @nn.compact
    def __call__(self, x, out, pos=None, train: bool = False):
        """x: low-level NHWC features; out: seg logits NHWC; pos: optional
        (pos_h, pos_w) int grids (B, H0, W0). Returns (gated_out, att)."""
        in_ch = x.shape[-1]
        mid1 = math.ceil(in_ch / self.r_factor)
        pool_len = 128 // self.pos_rfactor
        h_out = out.shape[1]

        x1d = adaptive_pool_rows(x, pool_len, self.pooling)  # (B, L, C)
        if self.dropout_prob > 0:
            x1d = nn.Dropout(self.dropout_prob, deterministic=not train)(x1d)

        def bn(name):
            return nn.BatchNorm(use_running_average=not bn_train_mode(self, train), momentum=0.9,
                                epsilon=1e-5, dtype=None, name=name)

        x1d = nn.Conv(mid1, (1,), use_bias=False, name="att1_conv")(x1d)
        x1d = nn.relu(bn("att1_bn")(x1d))

        if pos is not None and self.pos_injection == 2:
            pos_h = pos[0]  # (B or 1, H0, W0>=1)
            ph = (pos_h // self.pos_rfactor)[:, :, 0].astype(jnp.float32)
            ph = ph[:, :, None]  # (B, H0, 1)
            ph = jax.image.resize(
                ph, (ph.shape[0], pool_len, 1), method="nearest"
            )[..., 0].astype(jnp.int32)
            if train and self.pos_noise > 0.0:
                clamp = 16 // self.pos_rfactor
                noise = jax.random.normal(
                    self.make_rng("dropout"), ph.shape
                ) * self.pos_noise
                ph = ph + jnp.clip(
                    jnp.floor(noise).astype(jnp.int32), -clamp, clamp
                )
            ph = jnp.clip(ph, 0, pool_len)
            if self.is_encoding:
                table = jnp.asarray(sinusoid_table(pool_len + 1, mid1))
                x1d = x1d + table[ph]
            else:
                x1d = x1d + nn.Embed(
                    pool_len + 1, mid1, name="pos_emb1d_2nd"
                )(ph)

        if self.layer == 2:
            x1d = nn.Conv(self.out_channels, (self.kernel,),
                          padding=[(self.kernel // 2,) * 2], name="att2_conv")(x1d)
        else:
            mid2 = mid1 * 2
            x1d = nn.Conv(mid2, (3,), padding=[(1, 1)], name="att2_conv")(x1d)
            x1d = nn.relu(bn("att2_bn")(x1d))
            x1d = nn.Conv(self.out_channels, (self.kernel,),
                          padding=[(self.kernel // 2,) * 2], name="att3_conv")(x1d)
        att = nn.sigmoid(x1d)
        att = _interp1d_linear(att, h_out)  # (B, H, out_ch)
        gated = out * att[:, :, None, :]
        return gated, att
