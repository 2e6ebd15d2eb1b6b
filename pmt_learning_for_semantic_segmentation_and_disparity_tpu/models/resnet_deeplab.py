"""Dilated ResNet-50/101 backbone (deeplab style) with 5 taps, NHWC flax.

Re-design of models/resnet_deeplab.py:45-170: output_stride 16 -> strides
[1,2,2,1], dilations [1,1,1,2], multi-grid [1,2,4] last stage. Taps:
(64@/2, 256@/4, 512@/8, 1024@/16, 2048@/16).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import BACKBONES
from .blocks import bn_train_mode, he_fan_out
from .densenet import max_pool_3x3_s2

RESNET_TAP_CHANNELS = (64, 256, 512, 1024, 2048)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not bn_train_mode(self, train), momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name, dtype=None, name=name,
            )

        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False,
                    kernel_init=he_fan_out, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2, use_bias=False,
            kernel_init=he_fan_out, name="conv2",
        )(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    kernel_init=he_fan_out, name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, kernel_init=he_fan_out, name="down_conv",
            )(x)
            residual = bn("down_bn")(residual)
        return nn.relu(y + residual)


class ResNetDeeplabFeatures(nn.Module):
    """Two trunk flavors behind one module:

    * ``stem='7x7'``, ``multigrid=True`` — the deeplab_mod dilated resnet
      (models/resnet_deeplab.py:45-170): 7x7/2 stem, multi-grid (1,2,4)
      in the last stage.
    * ``stem='3x3x3'``, ``multigrid=False`` — HANet's ResNet3X3
      (models_hanet/Resnet.py:137-221 + resnet_pytorch.py:96-139 variant
      'D'): three 3x3 convs (64, 64, 128) then maxpool, uniform dilation
      (no multi-grid) in layers 3/4.
    """

    layers: Tuple[int, int, int, int] = (3, 4, 23, 3)
    output_stride: int = 16
    axis_name: Optional[str] = None
    stem: str = "7x7"
    multigrid: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.output_stride == 16:
            strides, dils = (1, 2, 2, 1), (1, 1, 1, 2)
        elif self.output_stride == 8:
            strides, dils = (1, 2, 1, 1), (1, 1, 2, 4)
        else:
            raise NotImplementedError
        mg = (1, 2, 4)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not bn_train_mode(self, train),
                momentum=0.9, epsilon=1e-5, axis_name=self.axis_name,
                dtype=None, name=name,
            )

        taps = []
        if self.stem == "3x3x3":
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                        use_bias=False, kernel_init=he_fan_out,
                        name="conv1")(x)
            x = nn.relu(bn("bn1")(x))
            x = nn.Conv(64, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                        kernel_init=he_fan_out, name="conv2")(x)
            x = nn.relu(bn("bn2")(x))
            x = nn.Conv(128, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                        kernel_init=he_fan_out, name="conv3")(x)
            x = nn.relu(bn("bn3")(x))
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, kernel_init=he_fan_out,
                        name="conv1")(x)
            x = nn.relu(bn("bn1")(x))
        taps.append(x)
        x = max_pool_3x3_s2(x)

        inplanes = 64
        for li, (planes, nblocks, stride, dil) in enumerate(
            zip((64, 128, 256, 512), self.layers, strides, dils)
        ):
            if li == 3 and self.multigrid:  # multi-grid (resnet_deeplab.py:94-111)
                for bi, g in enumerate(mg):
                    down = bi == 0 and (stride != 1 or inplanes != planes * 4)
                    x = Bottleneck(
                        planes, stride if bi == 0 else 1, g * dil, down,
                        axis_name=self.axis_name, name=f"layer4_block{bi}",
                    )(x, train)
                    inplanes = planes * 4
            else:
                for bi in range(nblocks):
                    down = bi == 0 and (stride != 1 or inplanes != planes * 4)
                    x = Bottleneck(
                        planes, stride if bi == 0 else 1, dil, down,
                        axis_name=self.axis_name,
                        name=f"layer{li + 1}_block{bi}",
                    )(x, train)
                    inplanes = planes * 4
            taps.append(x)
        return taps


@BACKBONES.register("resnet50")
def resnet50_deeplab(axis_name=None, name=None):
    return ResNetDeeplabFeatures((3, 4, 6, 3), 16, axis_name=axis_name, name=name)


@BACKBONES.register("resnet101")
def resnet101_deeplab(axis_name=None, name=None):
    return ResNetDeeplabFeatures((3, 4, 23, 3), 16, axis_name=axis_name, name=name)
