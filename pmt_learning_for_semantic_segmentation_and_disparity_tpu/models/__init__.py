"""Model zoo + factory.

``get_network(cfg)`` is the TPU-native replacement for the reference's
``getNetwork`` FUNCTION_MAP (util/utilLoadNetwork.py:7-59) — but the
output_type dispatch is pure (core.config.output_type_for) instead of
mutating the config.
"""
from __future__ import annotations

from ..core.config import ModelConfig, PMTConfig
from ..core.registry import MODELS, BACKBONES

# importing registers the factories
from . import densenet  # noqa: F401
from . import mobilenetv3  # noqa: F401
from . import resnet_deeplab  # noqa: F401
from .blocks import ConvBN, DeconvBN, Conv2DownUp, ConvOut  # noqa: F401
from .pyramid import PiramidNet2  # noqa: F401
from .aspp import ASPP  # noqa: F401
from . import sdnet  # noqa: F401
from .sdnet import MiniDSNetExt, MiniDSNet, SegNetHead  # noqa: F401
from . import psmnet  # noqa: F401
from . import deeplab  # noqa: F401
from . import warpnets  # noqa: F401
from . import sdnet_legacy  # noqa: F401
from . import ext_small  # noqa: F401
from . import sdnet_dlab  # noqa: F401
from . import hanet  # noqa: F401
from . import efficientnet  # noqa: F401


def get_network(cfg: PMTConfig, axis_name=None):
    """Build the configured model. Returns a flax Module."""
    factory = MODELS.get(cfg.model.net)
    return factory(cfg.model, labels=cfg.data.n_labels, axis_name=axis_name)
from .encdec import EncoderDecoderNet  # noqa: F401
