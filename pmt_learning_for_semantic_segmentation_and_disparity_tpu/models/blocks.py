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

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.dtypes import promote_dtype

from ..ops.s2d import embed_kernel, tile_channel_param
from ..ops.winograd import winograd_conv3x3, winograd_enabled

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


class SameConv(nn.Module):
    """Stride/dilation-aware SAME conv that owns its ``kernel``/``bias``
    params directly (paths identical to ``nn.Conv``: ``<name>/kernel``,
    ``<name>/bias``) so it can apply them EITHER as a plain NHWC conv or —
    when ``s2d=True`` — as the exact space-to-depth-domain equivalent
    (ops/s2d.py): the k x k kernel embeds into a 3x3 kernel over 4x the
    channels, filling the MXU's 128-wide tiles that 32-64-ch full-res convs
    otherwise waste. Checkpoints are interchangeable between the two modes.
    """

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    padding: str = "SAME"
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, s2d: bool = False):
        kh, kw = self.kernel
        cin = x.shape[-1] // (4 if s2d else 1)
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if s2d:
            assert (self.stride == 1 and self.dilation == 1
                    and self.padding == "SAME"), (
                "s2d conv supports stride=1 dilation=1 SAME only")
            if kh == kw == 1:
                # 1x1 convs commute with s2d as a per-phase channel matmul
                # (block-diagonal over phases) — embedding one as a dense
                # 3x3 4Cx4C' kernel would inflate FLOPs 36x
                x, kernel, bias = promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)
                n, h, w, _ = x.shape
                y = jnp.einsum(
                    "nhwpc,cd->nhwpd",
                    x.reshape(n, h, w, 4, cin), kernel[0, 0])
                y = y.reshape(n, h, w, 4 * self.features)
                if bias is not None:
                    y = y + tile_channel_param(bias)
                return y
            kernel = embed_kernel(kernel)
            if bias is not None:
                bias = tile_channel_param(bias)
            if winograd_enabled():
                # F(2x2,3x3) on the embedded kernel: 2.25x fewer MACs at
                # the same 128-lane-full matmul shapes (ops/winograd.py)
                x, kernel, bias = promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)
                return winograd_conv3x3(x, kernel, bias)
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, (self.stride, self.stride), self.padding,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=dn)
        if bias is not None:
            y = y + bias
        return y


class PhaseBatchNorm(nn.Module):
    """BatchNorm applied in the s2d domain while OWNING the original
    (C,)-shaped variables (names match ``nn.BatchNorm``: params
    ``scale``/``bias``, batch_stats ``mean``/``var``), so checkpoints are
    identical to the plain path. Per-channel statistics pool the 4 phase
    groups — each phase covers the same pixels as the full-res layout, so
    the result equals full-res BN exactly."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 4
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n, h, w, _ = x.shape
            xf = x.astype(jnp.float32).reshape(n, h, w, 4, c)
            mean = xf.mean(axis=(0, 1, 2, 3))
            mean2 = jnp.mean(xf * xf, axis=(0, 1, 2, 3))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        mean4 = tile_channel_param(mean)
        mul4 = tile_channel_param(jax.lax.rsqrt(var + self.epsilon) * scale)
        bias4 = tile_channel_param(bias)
        x, mean4, mul4, bias4 = promote_dtype(
            x, mean4, mul4, bias4, dtype=self.dtype)
        return (x - mean4) * mul4 + bias4


class ConvBN(nn.Module):
    """conv('SAME') [+BN] [+ReLU] [+dropout] (dsnet_t2.py:16-46).

    ``s2d=True`` runs the identical function in the space-to-depth domain
    (input/output are s2d tensors; see ops/s2d.py)."""

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
    def __call__(self, x, train: bool = False, s2d: bool = False):
        k = self.kernel if isinstance(self.kernel, tuple) else (self.kernel,) * 2
        x = SameConv(
            self.features,
            k,
            stride=self.stride,
            dilation=self.dilation,
            use_bias=False,  # conv2dSame/ConvTranspose2dSame default bias=False (torch_model.py:243,291)
            padding=self.padding,
            kernel_init=he_fan_out,
            dtype=self.dtype,
            name="conv",
        )(x, s2d=s2d)
        if self.batchnorm:
            if s2d:
                x = PhaseBatchNorm(
                    use_running_average=not bn_train_mode(self, train),
                    momentum=0.9,
                    epsilon=1e-5,
                    axis_name=self.axis_name,
                    dtype=None,
                    name="bn",
                )(x)
            else:
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
    def __call__(self, x, train: bool = False, s2d: bool = False):
        k = self.kernel if isinstance(self.kernel, tuple) else (self.kernel,) * 2
        if self.stride == 1:
            x = SameConv(
                self.features,
                k,
                use_bias=False,  # conv2dSame/ConvTranspose2dSame default bias=False (torch_model.py:243,291)
                kernel_init=he_fan_out,
                dtype=self.dtype,
                name="deconv",
            )(x, s2d=s2d)
        else:
            assert not s2d, "s2d deconv supports stride=1 only"
            # stride-2 'same' transposed conv (dsnet conv2DT_BA1/2,
            # dsnet_t2.py:149-151): output = stride * input
            x = nn.ConvTranspose(
                self.features,
                k,
                strides=(self.stride, self.stride),
                padding="SAME",
                use_bias=False,  # conv2dSame/ConvTranspose2dSame default bias=False (torch_model.py:243,291)
                kernel_init=he_fan_out,
                dtype=self.dtype,
                name="deconv",
            )(x)
        if self.batchnorm:
            if s2d:
                x = PhaseBatchNorm(
                    use_running_average=not bn_train_mode(self, train),
                    momentum=0.9,
                    epsilon=1e-5,
                    axis_name=self.axis_name,
                    dtype=None,
                    name="bn",
                )(x)
            else:
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
    def __call__(self, x, s2d: bool = False):
        return SameConv(
            self.features,
            (self.kernel, self.kernel),
            use_bias=False,
            kernel_init=nn.initializers.lecun_normal(),
            dtype=self.dtype,
            name="conv",
        )(x, s2d=s2d)


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
    def __call__(self, x, train: bool = False, s2d: bool = False):
        kw = dict(
            features=self.features,
            kernel=self.kernel,
            relu=True,
            dropout=self.dropout,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )
        x1 = ConvBN(name="c1", **kw)(x, train, s2d=s2d)
        x2 = ConvBN(name="c2", **kw)(x1, train, s2d=s2d)
        y = ConvBN(name="c3", **kw)(x2, train, s2d=s2d)
        y = DeconvBN(name="d3", **kw)(y, train, s2d=s2d)
        y = x2 + y
        y = DeconvBN(name="d4", **kw)(y, train, s2d=s2d)
        y = x1 + y
        if not self.last_layer:
            return y
        return DeconvBN(name="d5", **kw)(y, train, s2d=s2d)
