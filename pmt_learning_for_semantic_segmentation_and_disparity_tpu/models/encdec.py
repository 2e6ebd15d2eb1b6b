"""EncoderDecoderNet — UNet-hypercolumn segmentor with SCSE / SE-IBN /
ObjectContext decoders.

Reference: models_deeplab/net.py:12-79 (EncoderDecoderNet),
decoder.py:10-52 (DecoderUnetSCSE/SEIBN/OC), scse.py (SELayer/SCSEBlock),
ibn.py (IBN, ImprovedIBNaDecoderBlock), oc.py (SelfAttentionBlock2D,
BaseOC/BaseOC_Context/ASPOC), encoder.py:8-37 (resnet 5-stage split).
Instantiable via enc/dec type strings like the reference (not reachable
from its CLI, but part of the models_deeplab surface).

TPU notes: OC self-attention is plain q/k/v matmuls over (HW, C) — it maps
straight onto the MXU; NHWC throughout.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .blocks import bn_train_mode, he_fan_out
from .densenet import max_pool_3x3_s2


def _abn(x, mod, train, axis_name, name_scope):
    y = nn.BatchNorm(use_running_average=not bn_train_mode(mod, train), momentum=0.9,
                     epsilon=1e-5, axis_name=axis_name, dtype=None,
                     name=name_scope)(x)
    return nn.relu(y)


class SELayer(nn.Module):
    """scse.py:5-20."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(int(c / self.reduction), use_bias=False, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class SCSEBlock(nn.Module):
    """scse.py:23-43 — concurrent channel + spatial excitation."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        chn = jnp.mean(x, axis=(1, 2))
        chn = nn.Dense(int(c // self.reduction), name="fc1")(chn)
        chn = nn.relu(chn)
        chn = nn.Dense(c, name="fc2")(chn)
        chn_se = x * nn.sigmoid(chn)[:, None, None, :]
        spa = nn.Conv(1, (1, 1), use_bias=False, name="spatial")(x)
        spa_se = x * nn.sigmoid(spa)
        return chn_se + spa_se


class SelfAttentionBlock2D(nn.Module):
    """oc.py:12-68 — non-local block; q/k share weights, W zero-init."""

    key_channels: int
    value_channels: int
    out_channels: Optional[int] = None
    scale: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, c = x.shape
        out_ch = self.out_channels or c
        xs = x
        if self.scale > 1:
            xs = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, self.scale, self.scale, 1), (1, self.scale, self.scale, 1),
                "VALID",
            )
        hs, ws = xs.shape[1], xs.shape[2]
        f_key = nn.Conv(self.key_channels, (1, 1), name="f_key")
        key = _abn(f_key(xs), self, train, self.axis_name, "key_bn")
        query = key  # f_query = f_key (oc.py:41)
        value = nn.Conv(self.value_channels, (1, 1), name="f_value")(xs)

        q = query.reshape(b, hs * ws, self.key_channels)
        k = key.reshape(b, hs * ws, self.key_channels)
        v = value.reshape(b, hs * ws, self.value_channels)
        sim = jnp.einsum("bqc,bkc->bqk", q, k,
                         preferred_element_type=jnp.float32)
        sim = jax.nn.softmax(sim * (self.key_channels ** -0.5), axis=-1)
        ctx = jnp.einsum("bqk,bkv->bqv", sim, v)
        ctx = ctx.reshape(b, hs, ws, self.value_channels)
        ctx = nn.Conv(out_ch, (1, 1), kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="W")(ctx)
        if self.scale > 1:
            ctx = resize_bilinear(ctx, (h, w))
        return ctx


class BaseOC(nn.Module):
    """oc.py:102-112."""

    out_channels: int = 256
    dropout: float = 0.05
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    name="conv")(x)
        y = _abn(y, self, train, self.axis_name, "bn")
        ctx = SelfAttentionBlock2D(
            self.out_channels // 2, self.out_channels // 2,
            self.out_channels, axis_name=self.axis_name, name="attn",
        )(y, train)
        ctx = nn.Conv(self.out_channels, (1, 1), name="proj")(ctx)
        ctx = _abn(ctx, self, train, self.axis_name, "proj_bn")
        return nn.Dropout(self.dropout, deterministic=not train)(ctx)


class DecoderUnetSCSE(nn.Module):
    """decoder.py:10-22: conv+ABN+SCSE+2x deconv."""

    middle: int
    out: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, *args, train=False):
        x = jnp.concatenate(args, axis=-1) if len(args) > 1 else args[0]
        x = nn.Conv(self.middle, (3, 3), padding=[(1, 1)] * 2, name="conv")(x)
        x = _abn(x, self, train, self.axis_name, "bn")
        x = SCSEBlock(name="scse")(x)
        return nn.ConvTranspose(self.out, (4, 4), strides=(2, 2),
                                padding="SAME", name="up")(x)


class DecoderUnetSEIBN(nn.Module):
    """decoder.py:25-35 + ibn.py: SE then IBN-a decoder block."""

    middle: int
    out: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, *args, train=False):
        x = jnp.concatenate(args, axis=-1) if len(args) > 1 else args[0]
        x = SELayer(name="se")(x)
        cin = x.shape[-1]
        q = cin // 4
        y = nn.Conv(q, (1, 1), name="reduce")(x)
        # IBN-a: instance-norm half, batch-norm half (ibn.py:6-21)
        half = q // 2
        a = nn.LayerNorm(use_scale=True, use_bias=True, epsilon=1e-5,
                         reduction_axes=(1, 2), feature_axes=-1,
                         name="inorm")(y[..., :half])  # InstanceNorm2d eps
        a = nn.relu(a)
        bpart = nn.BatchNorm(use_running_average=not bn_train_mode(self, train), momentum=0.9,
                             epsilon=1e-5, axis_name=self.axis_name,
                             dtype=None, name="bnorm")(y[..., half:])
        bpart = nn.relu(bpart)
        y = jnp.concatenate([a, bpart], axis=-1)
        y = nn.ConvTranspose(q, (4, 4), strides=(2, 2), padding="SAME",
                             name="up")(y)
        y = _abn(y, self, train, self.axis_name, "up_bn")
        y = nn.Conv(self.out, (1, 1), name="proj")(y)
        return _abn(y, self, train, self.axis_name, "proj_bn")


class DecoderUnetOC(nn.Module):
    """decoder.py:38-52."""

    middle: int
    out: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, *args, train=False):
        x = jnp.concatenate(args, axis=-1) if len(args) > 1 else args[0]
        x = nn.Conv(self.middle, (3, 3), padding=[(1, 1)] * 2, name="conv")(x)
        x = _abn(x, self, train, self.axis_name, "bn")
        x = BaseOC(self.middle, dropout=0.2, axis_name=self.axis_name,
                   name="oc")(x, train)
        return nn.ConvTranspose(self.out, (4, 4), strides=(2, 2),
                                padding="SAME", name="up")(x)


_DECODERS = {"unet_scse": DecoderUnetSCSE, "unet_seibn": DecoderUnetSEIBN,
             "unet_oc": DecoderUnetOC}


class _ResBlock(nn.Module):
    planes: int
    stride: int = 1
    down: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        res = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False,
                    kernel_init=he_fan_out, name="c1")(x)
        y = _abn(y, self, train, self.axis_name, "b1")
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, use_bias=False,
                    kernel_init=he_fan_out, name="c2")(y)
        y = _abn(y, self, train, self.axis_name, "b2")
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    kernel_init=he_fan_out, name="c3")(y)
        y = nn.BatchNorm(use_running_average=not bn_train_mode(self, train), momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name, dtype=None,
                         name="b3")(y)
        if self.down:
            res = nn.Conv(self.planes * 4, (1, 1),
                          strides=(self.stride,) * 2, use_bias=False,
                          kernel_init=he_fan_out, name="down")(x)
            res = nn.BatchNorm(use_running_average=not bn_train_mode(self, train), momentum=0.9,
                               epsilon=1e-5, axis_name=self.axis_name,
                               dtype=None, name="down_bn")(res)
        return nn.relu(y + res)


class _BasicResBlock(nn.Module):
    """torchvision BasicBlock (resnet18/34, expansion 1): 3x3 s -> 3x3,
    identity (or 1x1-projected) skip (reference encoder.py:10-13 channel
    probe handles both block types)."""

    planes: int
    stride: int = 1
    down: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        res = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, use_bias=False,
                    kernel_init=he_fan_out, name="c1")(x)
        y = _abn(y, self, train, self.axis_name, "b1")
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, kernel_init=he_fan_out, name="c2")(y)
        y = nn.BatchNorm(use_running_average=not bn_train_mode(self, train),
                         momentum=0.9, epsilon=1e-5, axis_name=self.axis_name,
                         dtype=None, name="b2")(y)
        if self.down:
            res = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                          use_bias=False, kernel_init=he_fan_out,
                          name="down")(x)
            res = nn.BatchNorm(use_running_average=not bn_train_mode(self, train),
                               momentum=0.9, epsilon=1e-5,
                               axis_name=self.axis_name, dtype=None,
                               name="down_bn")(res)
        return nn.relu(y + res)


# enc_type -> (stage block counts, bottleneck?) — the torchvision resnets
# the reference's create_encoder actually reaches (encoder.py:17-36;
# resnext/senet branches are dead there: `import pretrainedmodels` is
# commented out at encoder.py:3, so those names NameError in the reference)
_RESNET_LAYERS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
    "resnet152": ((3, 8, 36, 3), True),
}


class EncoderDecoderNet(nn.Module):
    """models_deeplab/net.py:12-79: resnet 5-stage encoder, per-scale
    decoders, hypercolumn concat of the 5 decoder maps, 1x1+ABN+1x1 logits.
    """

    labels: int = 19
    enc_type: str = "resnet50"
    dec_type: str = "unet_scse"
    num_filters: int = 16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, right=None, train: bool = False, **_):
        assert self.enc_type in _RESNET_LAYERS, self.enc_type
        layers, bottleneck = _RESNET_LAYERS[self.enc_type]
        ax = self.axis_name
        Dec = _DECODERS[self.dec_type]
        nf = self.num_filters
        img_hw = (x.shape[1], x.shape[2])

        # encoder: e1 = layer0 (stem conv /2 + maxpool -> /4,
        # encoder.py:31-36), then layer1../4, layer2../8, layer3../16,
        # layer4../32
        e = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, kernel_init=he_fan_out, name="stem")(x)
        e = _abn(e, self, train, ax, "stem_bn")
        e1 = max_pool_3x3_s2(e)
        e = e1
        feats = []
        Block = _ResBlock if bottleneck else _BasicResBlock
        for li, (planes, n) in enumerate(zip((64, 128, 256, 512), layers)):
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                # BasicBlock layer1 keeps 64ch at stride 1 -> identity skip
                down = bi == 0 and (bottleneck or li > 0)
                e = Block(planes, stride, down, ax,
                          name=f"l{li + 1}_b{bi}")(e, train)
            feats.append(e)
        e2, e3, e4, e5 = feats  # /4 /8 /16 /32

        pool5 = jax.lax.reduce_window(
            e5, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        c = Dec(nf * 32 * 2, nf * 32, axis_name=ax, name="center")(
            pool5, train=train
        )
        d5 = Dec(nf * 32 * 2, nf * 16, axis_name=ax, name="dec5")(
            c, e5, train=train
        )
        d4 = Dec(nf * 16 * 2, nf * 8, axis_name=ax, name="dec4")(
            d5, e4, train=train
        )
        d3 = Dec(nf * 8 * 2, nf * 4, axis_name=ax, name="dec3")(
            d4, e3, train=train
        )
        d2 = Dec(nf * 4 * 2, nf * 2, axis_name=ax, name="dec2")(
            d3, e2, train=train
        )
        e1_up = resize_bilinear(e1, (e1.shape[1] * 2, e1.shape[2] * 2))
        d1 = Dec(nf * 2 * 2, nf, axis_name=ax, name="dec1")(
            d2, e1_up, train=train
        )

        u5 = resize_bilinear(d5, img_hw)
        u4 = resize_bilinear(d4, img_hw)
        u3 = resize_bilinear(d3, img_hw)
        u2 = resize_bilinear(d2, img_hw)
        d = jnp.concatenate([d1, u2, u3, u4, u5], axis=-1)
        y = nn.Conv(64, (1, 1), name="logits1")(d)
        y = _abn(y, self, train, ax, "logits_bn")
        logits = nn.Conv(self.labels, (1, 1), name="logits2")(y)
        return {"seg1": logits, "disp1": None, "seg2": None, "disp2": None}
