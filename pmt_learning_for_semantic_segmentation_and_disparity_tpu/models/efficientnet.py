"""EfficientNet feature extractor (b2/b3/b4/b5) with the 5 reduction
endpoints.

The reference uses the external efficientnet_pytorch package's
``extract_endpoints`` (models/dsnet_t2.py:2025-2031): reduction_k is the
activation just before each resolution drop, and reduction_5 is the 1x1
head-conv output at /32 (channel counts in the reference comments:
b2 (16,24,48,120,1408), b3 (24,32,48,136,1536), b5 (24,40,64,176,2048)).
Standard MBConv blocks: expand 1x1 -> depthwise kxk -> SE(0.25 of input) ->
project 1x1, swish activations, BN eps 1e-3.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import BACKBONES
from .blocks import bn_train_mode, he_fan_out

# (expand, channels, layers, stride, kernel) — B0 stage table
_B0_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

# width_mult, depth_mult
_SCALES = {
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
    "efficientnet-b5": (1.6, 2.2),
}


def round_filters(f: int, width: float, divisor: int = 8) -> int:
    f *= width
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


def round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(depth * r))


def swish(x):
    return x * nn.sigmoid(x)


class MBConv(nn.Module):
    cin: int
    cout: int
    expand: int
    kernel: int
    stride: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not bn_train_mode(self, train), momentum=0.99,
                                epsilon=1e-3, axis_name=self.axis_name,
                                dtype=None, name=name)

        mid = self.cin * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, kernel_init=he_fan_out,
                        name="expand")(y)
            y = swish(bn("expand_bn")(y))
        # efficientnet_pytorch pads TF-'SAME' dynamically (asymmetric for
        # stride 2 + even input) — flax 'SAME' has identical semantics
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride,) * 2, padding="SAME",
                    feature_group_count=mid, use_bias=False,
                    kernel_init=he_fan_out, name="dw")(y)
        y = swish(bn("dw_bn")(y))
        # squeeze-excite over 1/4 of the INPUT channels
        se_ch = max(1, self.cin // 4)
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), name="se_reduce")(s)
        s = swish(s)
        s = nn.Conv(mid, (1, 1), name="se_expand")(s)
        y = y * nn.sigmoid(s)
        y = nn.Conv(self.cout, (1, 1), use_bias=False, kernel_init=he_fan_out,
                    name="project")(y)
        y = bn("project_bn")(y)
        if self.stride == 1 and self.cin == self.cout:
            y = x + y
        return y


class EfficientNetFeatures(nn.Module):
    width: float = 1.0
    depth: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False) -> List[jnp.ndarray]:
        def bn(name):
            return nn.BatchNorm(use_running_average=not bn_train_mode(self, train), momentum=0.99,
                                epsilon=1e-3, axis_name=self.axis_name,
                                dtype=None, name=name)

        stem = round_filters(32, self.width)
        x = nn.Conv(stem, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, kernel_init=he_fan_out, name="stem")(x)
        x = swish(bn("stem_bn")(x))

        endpoints = []
        cin = stem
        bi = 0
        for si, (e, c, n, s, k) in enumerate(_B0_STAGES):
            cout = round_filters(c, self.width)
            reps = round_repeats(n, self.depth)
            for r in range(reps):
                stride = s if r == 0 else 1
                if stride == 2:
                    endpoints.append(x)  # activation before the drop
                x = MBConv(cin, cout, e, k, stride, self.axis_name,
                           name=f"block{bi}")(x, train)
                cin = cout
                bi += 1
        head = round_filters(1280, self.width)
        x = nn.Conv(head, (1, 1), use_bias=False, kernel_init=he_fan_out,
                    name="head")(x)
        x = swish(bn("head_bn")(x))
        endpoints.append(x)  # reduction_5 at /32
        return endpoints


for _name, (_w, _d) in _SCALES.items():
    def _make(axis_name=None, name=None, _w=_w, _d=_d):
        return EfficientNetFeatures(width=_w, depth=_d, axis_name=axis_name,
                                    name=name)

    BACKBONES.register(_name)(_make)
