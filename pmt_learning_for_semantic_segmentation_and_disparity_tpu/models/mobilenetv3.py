"""MobileNetV3-Large backbone with feature taps at blocks {1,3,6,12,15}
(reference models/mobilenetv3.py:168-179), NHWC flax re-design.

Tap channels: (16@/2, 24@/4, 40@/8, 112@/16, 160@/32).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import BACKBONES
from .blocks import bn_train_mode, he_fan_out


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def h_swish(x):
    return x * h_sigmoid(x)


class SELayer(nn.Module):
    channel: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))  # (B,C)
        hidden = _make_divisible(self.channel // self.reduction, 8)
        y = nn.Dense(hidden, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channel, name="fc2")(y)
        y = h_sigmoid(y)
        return x * y[:, None, None, :]


class InvertedResidual(nn.Module):
    inp: int
    hidden_dim: int
    oup: int
    kernel: int
    stride: int
    use_se: bool
    use_hs: bool
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not bn_train_mode(self, train), momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name, dtype=None, name=name,
            )

        act = h_swish if self.use_hs else nn.relu
        identity = self.stride == 1 and self.inp == self.oup
        pad = (self.kernel - 1) // 2
        y = x
        if self.inp != self.hidden_dim:
            y = nn.Conv(
                self.hidden_dim, (1, 1), use_bias=False,
                kernel_init=he_fan_out, name="pw",
            )(y)
            y = act(bn("pw_bn")(y))
        # depthwise
        y = nn.Conv(
            self.hidden_dim, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.hidden_dim, use_bias=False,
            kernel_init=he_fan_out, name="dw",
        )(y)
        y = bn("dw_bn")(y)
        if self.inp == self.hidden_dim:
            y = act(y)
            if self.use_se:
                y = SELayer(self.hidden_dim, name="se")(y)
        else:
            if self.use_se:
                y = SELayer(self.hidden_dim, name="se")(y)
            y = act(y)
        # pointwise-linear
        y = nn.Conv(
            self.oup, (1, 1), use_bias=False, kernel_init=he_fan_out, name="pw_lin"
        )(y)
        y = bn("pw_lin_bn")(y)
        return x + y if identity else y


_LARGE_CFG = [
    # k, t, c, SE, HS, s  (models/mobilenetv3.py:201-218)
    (3, 1, 16, 0, 0, 1),
    (3, 4, 24, 0, 0, 2),
    (3, 3, 24, 0, 0, 1),
    (5, 3, 40, 1, 0, 2),
    (5, 3, 40, 1, 0, 1),
    (5, 3, 40, 1, 0, 1),
    (3, 6, 80, 0, 1, 2),
    (3, 2.5, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1),
    (3, 6, 112, 1, 1, 1),
    (3, 6, 112, 1, 1, 1),
    (5, 6, 160, 1, 1, 2),
    (5, 6, 160, 1, 1, 1),
    (5, 6, 160, 1, 1, 1),
]

MOBILENET_TAP_CHANNELS = (16, 24, 40, 112, 160)


class MobileNetV3LargeFeatures(nn.Module):
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        taps = []
        x = nn.Conv(
            16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False,
            kernel_init=he_fan_out, name="stem",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not bn_train_mode(self, train), momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name, dtype=None, name="stem_bn",
        )(x)
        x = h_swish(x)
        inp = 16
        # features[0] is the stem; taps at module indices {1,3,6,12,15}
        for i, (k, t, c, se, hs, s) in enumerate(_LARGE_CFG):
            oup = _make_divisible(c * 1.0, 8)
            hidden = _make_divisible(inp * t, 8)
            x = InvertedResidual(
                inp, hidden, oup, k, s, bool(se), bool(hs),
                axis_name=self.axis_name, name=f"block{i + 1}",
            )(x, train)
            inp = oup
            if (i + 1) in (1, 3, 6, 12, 15):
                taps.append(x)
        return taps


@BACKBONES.register("mobilenet")
def mobilenetv3_large(axis_name=None, name=None):
    return MobileNetV3LargeFeatures(axis_name=axis_name, name=name)
