"""Shared building blocks of the SDNet family, as Flax linen modules (NHWC).

Re-designs of models/dsnet_t2.py:16-117 and models/torch_model.py:236-357:

* ``ConvBN``     — conv2dSame + BatchNorm (+optional ReLU); TF-'SAME'
                   asymmetric padding comes for free from flax/XLA, which is
                   exactly what the reference hand-computes per forward
                   (torch_model.py:268-281).
* ``DeconvBN``   — ConvTranspose2dSame. Every use in the reference is
                   stride 1 with an odd kernel, where the transposed conv +
                   centered crop is mathematically a SAME convolution with a
                   flipped kernel (torch_model.py:320-349); we therefore run
                   it as a regular SAME conv (identical function space, far
                   better for the MXU). The torch->flax weight converter flips
                   kernels when importing checkpoints.
* ``Conv2DownUp``— the 3-conv + 3-deconv hourglass with two internal residual
                   adds (dsnet_t2.py:80-117).
* ``SegNetHead`` — the seg decoder helper (dsnet_t2.py:915-938).

BatchNorm matches torch defaults: eps=1e-5, momentum 0.1 (flax momentum=0.9),
optionally synchronized across the data axis via ``axis_name`` — the SPMD
replacement for the reference's SyncBatchNorm machinery (sync_batchnorm/,
torch_implementation.py:739).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

# He-normal with fan_out: normal(0, sqrt(2/(kh*kw*out))) — the reference's
# init everywhere (dsnet_t2.py:37-43, torch_model.py:260-266).
he_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

Dtype = Any


def bn_train_mode(module: nn.Module, train: bool) -> bool:
    """BatchNorm training mode requires BOTH train=True and a mutable
    ``batch_stats`` collection.

    Running ``apply(..., train=True)`` WITHOUT ``mutable=['batch_stats']``
    therefore puts exactly the BN layers in eval mode (running stats, no
    stat update) while dropout stays live — the reference's ``freeze_bn``
    and deeplab BN-eval semantics, which ``.eval()`` only the BN modules
    (networkOutput torch_implementation.py:236-241, train_model :337-340)
    rather than the whole model.
    """
    return train and module.is_mutable_collection("batch_stats")


class ConvBN(nn.Module):
    """conv('SAME') [+BN] [+ReLU] [+dropout] (dsnet_t2.py:16-46)."""

    features: int
    kernel: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    dilation: int = 1
    batchnorm: bool = True
    relu: bool = False
    dropout: float = 0.0
    padding: str = "SAME"
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel if isinstance(self.kernel, tuple) else (self.kernel,) * 2
        x = nn.Conv(
            self.features,
            k,
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=self.padding,
            use_bias=not self.batchnorm,
            kernel_init=he_fan_out,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.batchnorm:
            x = nn.BatchNorm(
                use_running_average=not bn_train_mode(self, train),
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name,
                dtype=None,
                name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DeconvBN(nn.Module):
    """deconvbn (dsnet_t2.py:48-77). Stride-1 'same' transposed conv == SAME
    conv with a flipped kernel; implemented as the latter (see module doc)."""

    features: int
    kernel: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    batchnorm: bool = True
    relu: bool = False
    dropout: float = 0.0
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel if isinstance(self.kernel, tuple) else (self.kernel,) * 2
        if self.stride == 1:
            x = nn.Conv(
                self.features,
                k,
                padding="SAME",
                use_bias=not self.batchnorm,
                kernel_init=he_fan_out,
                dtype=self.dtype,
                name="deconv",
            )(x)
        else:
            # stride-2 'same' transposed conv (dsnet conv2DT_BA1/2,
            # dsnet_t2.py:149-151): output = stride * input
            x = nn.ConvTranspose(
                self.features,
                k,
                strides=(self.stride, self.stride),
                padding="SAME",
                use_bias=not self.batchnorm,
                kernel_init=he_fan_out,
                dtype=self.dtype,
                name="deconv",
            )(x)
        if self.batchnorm:
            x = nn.BatchNorm(
                use_running_average=not bn_train_mode(self, train),
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name,
                dtype=None,
                name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ConvOut(nn.Module):
    """Bare output conv (the reference's ConvTranspose2dSame(init_he=False)
    heads, e.g. dsnet_t2.py:1098,1124) — stride-1 SAME conv with bias-free
    default torch parameterization."""

    features: int
    kernel: int = 3
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)


class Conv2DownUp(nn.Module):
    """3x conv(+bn+relu) then 3x deconv(+bn+relu) with residual adds after
    d3 and d4 (dsnet_t2.py:80-117). ``last_layer=False`` drops d5."""

    features: int
    kernel: int = 3
    last_layer: bool = True
    dropout: float = 0.0
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(
            features=self.features,
            kernel=self.kernel,
            relu=True,
            dropout=self.dropout,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )
        x1 = ConvBN(name="c1", **kw)(x, train)
        x2 = ConvBN(name="c2", **kw)(x1, train)
        y = ConvBN(name="c3", **kw)(x2, train)
        y = DeconvBN(name="d3", **kw)(y, train)
        y = x2 + y
        y = DeconvBN(name="d4", **kw)(y, train)
        y = x1 + y
        if not self.last_layer:
            return y
        return DeconvBN(name="d5", **kw)(y, train)
