"""ASPP (dsnet flavor) — 4 dilated branches + global pool branch, NHWC.

Re-design of models/aspp.py:7-112. Dilations keyed by output_stride
(32 -> [1,2,6,12]; 16 -> [1,6,12,18]); inplanes are resolved by the caller
from the backbone tap, so this module is shape-polymorphic.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear_align_corners
from .blocks import bn_train_mode, he_fan_out

_DILATIONS = {32: (1, 2, 6, 12), 16: (1, 6, 12, 18), 8: (1, 12, 24, 36)}


class ASPP(nn.Module):
    output_stride: int = 32
    features: int = 256
    dropout: float = 0.5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dils = _DILATIONS[self.output_stride]

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not bn_train_mode(self, train), momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name, dtype=None, name=name,
            )

        def branch(inp, k, d, name):
            pad = [(0, 0), (0, 0)] if k == 1 else [(d, d), (d, d)]
            y = nn.Conv(
                self.features, (k, k), kernel_dilation=(d, d), padding=pad,
                use_bias=False, kernel_init=nn.initializers.kaiming_normal(),
                name=f"{name}_conv",
            )(inp)
            return nn.relu(bn(f"{name}_bn")(y))

        b1 = branch(x, 1, dils[0], "aspp1")
        b2 = branch(x, 3, dils[1], "aspp2")
        b3 = branch(x, 3, dils[2], "aspp3")
        b4 = branch(x, 3, dils[3], "aspp4")
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = nn.Conv(
            self.features, (1, 1), use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(), name="gp_conv",
        )(gp)
        gp = nn.relu(bn("gp_bn")(gp))
        gp = resize_bilinear_align_corners(gp, (x.shape[1], x.shape[2]))
        y = jnp.concatenate([b1, b2, b3, b4, gp], axis=-1)
        y = nn.Conv(
            self.features, (1, 1), use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(), name="proj_conv",
        )(y)
        y = nn.relu(bn("proj_bn")(y))
        return nn.Dropout(self.dropout, deterministic=not train)(y)
