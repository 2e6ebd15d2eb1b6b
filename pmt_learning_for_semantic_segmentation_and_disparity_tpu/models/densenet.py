"""DenseNet backbones returning 5 per-stage feature taps (NHWC).

Re-design of the reference's modified torchvision DenseNet
(models/densenet.py:131-246): the classifier is dropped and the forward
returns [conv0, trans1, trans2, trans3, norm5+relu] — i.e. taps at strides
/2, /4, /8, /16, /32 with (64,128,256,512,1024) channels for densenet121.
The stage pooling is moved OUT of the transition (avg_pool after the tap,
densenet.py:229-232), which is why tap_k has the pre-pool resolution.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn

from .blocks import bn_train_mode
import jax
import jax.numpy as jnp

from ..core.registry import BACKBONES
from ..ops.resize import avg_pool


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """nn.MaxPool2d(3, 2, padding=1)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    axis_name: Optional[str] = None
    dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not bn_train_mode(self, train), momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name, dtype=None, name=name,
            )

        y = nn.relu(bn("norm1")(x))
        y = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(), name="conv1",
        )(y)
        y = nn.relu(bn("norm2")(y))
        y = nn.Conv(
            self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(), name="conv2",
        )(y)
        return jnp.concatenate([x, y], axis=-1)


class _DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            x = _DenseLayer(
                self.growth_rate, axis_name=self.axis_name,
                name=f"denselayer{i + 1}",
            )(x, train)
        return x


class _Transition(nn.Module):
    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not bn_train_mode(self, train), momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name, dtype=None, name="norm",
        )(x)
        x = nn.relu(x)
        return nn.Conv(
            self.features, (1, 1), use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(), name="conv",
        )(x)


class DenseNetFeatures(nn.Module):
    """Returns the 5 taps. block_config/growth/init follow torchvision."""

    block_config: Tuple[int, int, int, int] = (6, 12, 24, 16)
    growth_rate: int = 32
    num_init_features: int = 64
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        taps = []
        x = nn.Conv(
            self.num_init_features, (7, 7), strides=(2, 2),
            padding=[(3, 3), (3, 3)], use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(), name="conv0",
        )(x)
        taps.append(x)  # /2, pre-BN (densenet.py:223-224)
        x = nn.BatchNorm(
            use_running_average=not bn_train_mode(self, train), momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name, dtype=None, name="norm0",
        )(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)  # /4

        n_feat = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            x = _DenseBlock(
                num_layers, self.growth_rate, axis_name=self.axis_name,
                name=f"denseblock{i + 1}",
            )(x, train)
            n_feat += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                n_feat //= 2
                x = _Transition(
                    n_feat, axis_name=self.axis_name, name=f"transition{i + 1}"
                )(x, train)
                taps.append(x)  # tap BEFORE the pool (densenet.py:229-232)
                x = avg_pool(x, 2, 2)
        x = nn.BatchNorm(
            use_running_average=not bn_train_mode(self, train), momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name, dtype=None, name="norm5",
        )(x)
        taps.append(nn.relu(x))
        return taps


@BACKBONES.register("densenet")
def densenet121(axis_name=None, name=None):
    return DenseNetFeatures((6, 12, 24, 16), 32, 64, axis_name=axis_name, name=name)


@BACKBONES.register("dn169")
def densenet169(axis_name=None, name=None):
    return DenseNetFeatures((6, 12, 32, 32), 32, 64, axis_name=axis_name, name=name)


@BACKBONES.register("dn201")
def densenet201(axis_name=None, name=None):
    return DenseNetFeatures((6, 12, 48, 32), 32, 64, axis_name=axis_name, name=name)


@BACKBONES.register("dn161")
def densenet161(axis_name=None, name=None):
    return DenseNetFeatures((6, 12, 36, 24), 48, 96, axis_name=axis_name, name=name)


# tap channel counts per backbone (models/dsnet_t2.py:1898-1932 comments)
DENSENET_TAP_CHANNELS = {
    "densenet": (64, 128, 256, 512, 1024),
    "dn169": (64, 128, 256, 640, 1664),
    "dn201": (64, 128, 256, 896, 1920),
    "dn161": (96, 192, 384, 1056, 2208),
}
