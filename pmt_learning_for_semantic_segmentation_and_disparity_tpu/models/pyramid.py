"""PiramidNet2 — backbone + PSM-style avg-pool pyramid enrichment, NHWC.

Re-design of models/dsnet_t2.py:1893-2083: a 5-tap backbone plus pyramid
branches over the first three taps. Branch k of tap t avg-pools with
kernel=stride=pool_val[t+k+1..], convbn(32,3x3)+relu, and bilinearly resizes
back; the enriched maps concatenate the tap with its branches:

    b0 = cat(tap0, 5 branches)  -> C0 + 160 channels (at /2)
    b1 = cat(tap1, 4 branches)  -> C1 + 128          (at /4)
    b2 = cat(tap2, 3 branches)  -> C2 +  96          (at /8)

Returns (tap0..tap4, b2, b1, b0) in the reference's order.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import BACKBONES
from ..ops.resize import avg_pool, resize_bilinear
from .blocks import ConvBN

POOL_VALS = (128, 64, 32, 16, 8)


class PiramidNet2(nn.Module):
    backbone: str = "densenet"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        backbone = BACKBONES.get(self.backbone)(
            axis_name=self.axis_name, name="backbone"
        )
        taps = backbone(x, train)
        out0, out1, out2, out3, out4 = taps

        def branch(inp, pool, name):
            # clamp: identical at reference resolutions (pool <= map size for
            # crops >= 256), but keeps small smoke-test shapes well-defined
            pool = min(pool, inp.shape[1], inp.shape[2])
            y = avg_pool(inp, pool, pool)
            y = ConvBN(
                32, 3, relu=True, axis_name=self.axis_name, name=name
            )(y, train)
            return resize_bilinear(y, (inp.shape[1], inp.shape[2]))

        b0 = jnp.concatenate(
            [out0] + [branch(out0, POOL_VALS[k], f"branch0_{k}") for k in range(5)],
            axis=-1,
        )
        b1 = jnp.concatenate(
            [out1]
            + [branch(out1, POOL_VALS[k + 1], f"branch1_{k}") for k in range(4)],
            axis=-1,
        )
        b2 = jnp.concatenate(
            [out2]
            + [branch(out2, POOL_VALS[k + 2], f"branch2_{k}") for k in range(3)],
            axis=-1,
        )
        return out0, out1, out2, out3, out4, b2, b1, b0


class PiramidNetV1(nn.Module):
    """The ORIGINAL piramidNet used by dsnet/dsnetv2 (dsnet_t2.py:324-397):
    densenet121 only, 5 branches on tap0 and 3 branches — confusingly named
    branch1_* in the reference — applied to tap2 with pools 32/16/8.
    Returns (tap0..tap4, b2, b0): no enriched tap1."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        backbone = BACKBONES.get("densenet")(
            axis_name=self.axis_name, name="backbone"
        )
        out0, out1, out2, out3, out4 = backbone(x, train)

        def branch(inp, pool, name):
            pool = min(pool, inp.shape[1], inp.shape[2])
            y = avg_pool(inp, pool, pool)
            y = ConvBN(32, 3, relu=True, axis_name=self.axis_name, name=name)(
                y, train
            )
            return resize_bilinear(y, (inp.shape[1], inp.shape[2]))

        b0 = jnp.concatenate(
            [out0] + [branch(out0, POOL_VALS[k], f"branch0_{k}") for k in range(5)],
            axis=-1,
        )
        b2 = jnp.concatenate(
            [out2]
            + [branch(out2, POOL_VALS[k + 2], f"branch1_{k}") for k in range(3)],
            axis=-1,
        )
        return out0, out1, out2, out3, out4, b2, b0


class PiramidNet2Warp(nn.Module):
    """The warp-family variant (models/dsnet_t2_warp.py:339-480): same as
    PiramidNet2 plus a 4th pyramid tap over backbone tap 3 (two branches,
    pools 16/8 -> +64 ch), returned in the order (taps..., b0, b1, b2, b3)."""

    backbone: str = "densenet"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        backbone = BACKBONES.get(self.backbone)(
            axis_name=self.axis_name, name="backbone"
        )
        out0, out1, out2, out3, out4 = backbone(x, train)

        def branch(inp, pool, name):
            pool = min(pool, inp.shape[1], inp.shape[2])
            y = avg_pool(inp, pool, pool)
            y = ConvBN(32, 3, relu=True, axis_name=self.axis_name, name=name)(
                y, train
            )
            return resize_bilinear(y, (inp.shape[1], inp.shape[2]))

        b0 = jnp.concatenate(
            [out0] + [branch(out0, POOL_VALS[k], f"branch0_{k}") for k in range(5)],
            axis=-1,
        )
        b1 = jnp.concatenate(
            [out1]
            + [branch(out1, POOL_VALS[k + 1], f"branch1_{k}") for k in range(4)],
            axis=-1,
        )
        b2_maps = [branch(out2, POOL_VALS[k + 2], f"branch2_{k}")
                   for k in range(3)]
        b2 = jnp.concatenate([out2] + b2_maps, axis=-1)
        # Reference quirk (dsnet_t2_warp.py:476-477): the b3 concat's second
        # slot interpolates **b2_1** (branch2_1's already-resized map), NOT
        # branch3_1's output — branch3_1 is computed and discarded. We call
        # branch3_1 so its params/stats exist (matching the torch state
        # dict), discard the result, and resize b2_1 like the reference.
        b3_0 = branch(out3, POOL_VALS[3], "branch3_0")
        _ = branch(out3, POOL_VALS[4], "branch3_1")
        b3_1 = resize_bilinear(b2_maps[1], (out3.shape[1], out3.shape[2]))
        b3 = jnp.concatenate([out3, b3_0, b3_1], axis=-1)
        return out0, out1, out2, out3, out4, b0, b1, b2, b3
