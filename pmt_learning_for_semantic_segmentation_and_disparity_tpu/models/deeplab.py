"""DeepLabV3+ family (mono + stereo), NHWC flax re-design.

References:
* models_deeplab/net.py:82-135  — mono SPPNet (xception65/mobilenetv2 + ASPP
  + SPPDecoder); eval path scales input to [-1,1], pads by 1 and resizes the
  logits with align_corners=True (torch_implementation.py:123-131, 159-162).
* models_deeplab_mod/net.py:82-169 — stereo SPPNet: xception65 with two
  extra middle-flow taps (blocks 8/14, xception.py:81-118), a 1-D
  correlation between projected mid features, and three CHAINED SPPDecoders
  (seg -> disp -> seg2) passing their concat intermediates forward
  (spp.py:131-157).
* models_deeplab/xception.py, mobilenet.py, spp.py, common.py — blocks.

The encoder BN eps tweak (update_bn_eps -> 1e-3, net.py:112-115) is a
constructor flag here.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import MODELS
from ..ops.correlation import correlation
from ..ops.resize import resize_bilinear, resize_bilinear_align_corners
from .blocks import bn_train_mode, he_fan_out


def _bn(mod, train, axis_name, name, eps=1e-5):
    return nn.BatchNorm(
        use_running_average=not bn_train_mode(mod, train), momentum=0.9, epsilon=eps,
        axis_name=axis_name, dtype=None, name=name,
    )


class SeparableConv(nn.Module):
    """SeparableConv2d (models_deeplab/common.py:25-52)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu_first: bool = True
    axis_name: Optional[str] = None
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        pad = self.dilation
        if self.relu_first:
            x = nn.relu(x)
        x = nn.Conv(
            c, (self.kernel, self.kernel), strides=(self.stride,) * 2,
            kernel_dilation=(self.dilation,) * 2, padding=[(pad, pad)] * 2,
            feature_group_count=c, use_bias=False, kernel_init=he_fan_out,
            name="depthwise",
        )(x)
        x = _bn(self, train, self.axis_name, "bn_depth", self.bn_eps)(x)
        if not self.relu_first:
            x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=he_fan_out, name="pointwise")(x)
        x = _bn(self, train, self.axis_name, "bn_point", self.bn_eps)(x)
        if not self.relu_first:
            x = nn.relu(x)
        return x


class XceptionBlock(nn.Module):
    """models_deeplab/xception.py:7-46."""

    channels: Tuple[int, int, int, int]
    stride: int = 1
    dilation: int = 1
    skip: str = "conv"  # conv | sum | none
    relu_first: bool = True
    low_feat: bool = False
    axis_name: Optional[str] = None
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False):
        kw = dict(relu_first=self.relu_first, dilation=self.dilation,
                  axis_name=self.axis_name, bn_eps=self.bn_eps)
        sc1 = SeparableConv(self.channels[1], name="sep1", **kw)(x, train)
        sc2 = SeparableConv(self.channels[2], name="sep2", **kw)(sc1, train)
        res = SeparableConv(self.channels[3], stride=self.stride, name="sep3",
                            **kw)(sc2, train)
        if self.skip == "conv":
            sc = nn.Conv(self.channels[3], (1, 1), strides=(self.stride,) * 2,
                         use_bias=False, kernel_init=he_fan_out,
                         name="skip_conv")(x)
            sc = _bn(self, train, self.axis_name, "skip_bn", self.bn_eps)(sc)
            out = res + sc
        elif self.skip == "sum":
            out = res + x
        else:
            out = res
        if self.low_feat:
            return out, sc2
        return out


class Xception65(nn.Module):
    """models_deeplab/xception.py:49-135 (+the _mod extra taps)."""

    output_stride: int = 8
    extra_taps: bool = False  # deeplab_mod: taps at middle blocks 8 & 14
    axis_name: Optional[str] = None
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False):
        if self.output_stride == 16:
            entry3_stride, mid_dil, exit_dil = 2, 1, (1, 2)
        elif self.output_stride == 8:
            entry3_stride, mid_dil, exit_dil = 1, 2, (2, 4)
        else:
            raise NotImplementedError
        ax, eps = self.axis_name, self.bn_eps

        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                    use_bias=False, kernel_init=he_fan_out, name="conv1")(x)
        x = nn.relu(_bn(self, train, ax, "bn1", eps)(x))
        x = nn.Conv(64, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    kernel_init=he_fan_out, name="conv2")(x)
        x = nn.relu(_bn(self, train, ax, "bn2", eps)(x))

        x = XceptionBlock((64, 128, 128, 128), stride=2, axis_name=ax,
                          bn_eps=eps, name="block1")(x, train)
        x, low = XceptionBlock((128, 256, 256, 256), stride=2, low_feat=True,
                               axis_name=ax, bn_eps=eps, name="block2")(x, train)
        x = XceptionBlock((256, 728, 728, 728), stride=entry3_stride,
                          axis_name=ax, bn_eps=eps, name="block3")(x, train)

        mid2 = high3 = None
        for i in range(4, 20):
            lf = self.extra_taps and i in (8, 14)
            out = XceptionBlock(
                (728, 728, 728, 728), dilation=mid_dil, skip="sum",
                low_feat=lf, axis_name=ax, bn_eps=eps, name=f"block{i}",
            )(x, train)
            if lf:
                x, tap = out
                if i == 8:
                    mid2 = tap
                else:
                    high3 = tap
            else:
                x = out

        x = XceptionBlock((728, 728, 1024, 1024), dilation=exit_dil[0],
                          axis_name=ax, bn_eps=eps, name="block20")(x, train)
        x = XceptionBlock((1024, 1536, 1536, 2048), dilation=exit_dil[1],
                          skip="none", relu_first=False, axis_name=ax,
                          bn_eps=eps, name="block21")(x, train)
        if self.extra_taps:
            return x, low, mid2, high3
        return x, low


class MobileNetV2Encoder(nn.Module):
    """models_deeplab/mobilenet.py:53-103 (output_stride 8, 320ch out)."""

    axis_name: Optional[str] = None
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False):
        ax, eps = self.axis_name, self.bn_eps

        def expanded(x, cin, cout, stride=1, dil=1, ratio=6, skip=False, name=""):
            mid = cin * ratio
            y = x
            if ratio != 1:
                y = nn.Conv(mid, (1, 1), use_bias=False,
                            kernel_init=he_fan_out, name=f"{name}_expand")(y)
                y = jnp.minimum(nn.relu(_bn(self, train, ax, f"{name}_ebn", eps)(y)), 6.0)
            y = nn.Conv(mid, (3, 3), strides=(stride,) * 2,
                        kernel_dilation=(dil,) * 2, padding=[(dil, dil)] * 2,
                        feature_group_count=mid, use_bias=False,
                        kernel_init=he_fan_out, name=f"{name}_dw")(y)
            y = jnp.minimum(nn.relu(_bn(self, train, ax, f"{name}_dbn", eps)(y)), 6.0)
            y = nn.Conv(cout, (1, 1), use_bias=False, kernel_init=he_fan_out,
                        name=f"{name}_proj")(y)
            y = _bn(self, train, ax, f"{name}_pbn", eps)(y)
            return x + y if skip else y

        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                    use_bias=False, kernel_init=he_fan_out, name="stem")(x)
        x = jnp.minimum(nn.relu(_bn(self, train, ax, "stem_bn", eps)(x)), 6.0)
        cfg = [  # (cin, cout, stride, dil, ratio, skip) — mobilenet.py:61-77
            (32, 16, 1, 1, 1, False), (16, 24, 2, 1, 6, False),
            (24, 24, 1, 1, 6, True), (24, 32, 2, 1, 6, False),
            (32, 32, 1, 1, 6, True), (32, 32, 1, 1, 6, True),
            (32, 64, 1, 1, 6, False), (64, 64, 1, 2, 6, True),
            (64, 64, 1, 2, 6, True), (64, 64, 1, 2, 6, True),
            (64, 96, 1, 2, 6, False), (96, 96, 1, 2, 6, True),
            (96, 96, 1, 2, 6, True), (96, 160, 1, 2, 6, False),
            (160, 160, 1, 4, 6, True), (160, 160, 1, 4, 6, True),
            (160, 320, 1, 4, 6, False),
        ]
        for i, (ci, co, s, d, r, sk) in enumerate(cfg):
            x = expanded(x, ci, co, s, d, r, sk, name=f"block{i}")
        return x


class ASPPDeeplab(nn.Module):
    """models_deeplab/spp.py:34-77 (separable-conv ASPP)."""

    features: int = 256
    output_stride: int = 8
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        dil = (12, 24, 36) if self.output_stride == 8 else (6, 12, 18)
        ax = self.axis_name
        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = nn.Conv(self.features, (1, 1), use_bias=False,
                       kernel_init=he_fan_out, name="gap_conv")(pool)
        pool = nn.relu(_bn(self, train, ax, "gap_bn")(pool))
        pool = resize_bilinear_align_corners(pool, (x.shape[1], x.shape[2]))
        a0 = nn.Conv(self.features, (1, 1), use_bias=False,
                     kernel_init=he_fan_out, name="aspp0_conv")(x)
        a0 = nn.relu(_bn(self, train, ax, "aspp0_bn")(a0))
        outs = [pool, a0]
        for i, d in enumerate(dil):
            outs.append(
                SeparableConv(self.features, dilation=d, relu_first=False,
                              axis_name=ax, name=f"aspp{i + 1}")(x, train)
            )
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=he_fan_out, name="proj")(y)
        y = nn.relu(_bn(self, train, ax, "proj_bn")(y))
        # reference uses Dropout2d (channelwise) — broadcast over H,W
        return nn.Dropout(0.1, broadcast_dims=(1, 2),
                          deterministic=not train)(y)


class MobileASPP(nn.Module):
    """models_deeplab/spp.py:80-108."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        ax = self.axis_name
        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = nn.Conv(256, (1, 1), use_bias=False, kernel_init=he_fan_out,
                       name="gap_conv")(pool)
        pool = nn.relu(_bn(self, train, ax, "gap_bn")(pool))
        pool = resize_bilinear_align_corners(pool, (x.shape[1], x.shape[2]))
        a0 = nn.Conv(256, (1, 1), use_bias=False, kernel_init=he_fan_out,
                     name="aspp0_conv")(x)
        a0 = nn.relu(_bn(self, train, ax, "aspp0_bn")(a0))
        y = jnp.concatenate([pool, a0], axis=-1)
        y = nn.Conv(256, (1, 1), use_bias=False, kernel_init=he_fan_out,
                    name="proj")(y)
        y = nn.relu(_bn(self, train, ax, "proj_bn")(y))
        # reference uses Dropout2d (channelwise) — broadcast over H,W
        return nn.Dropout(0.1, broadcast_dims=(1, 2),
                          deterministic=not train)(y)


class SPPDecoder(nn.Module):
    """models_deeplab_mod/spp.py:131-157 (superset: concat_prev + the
    intermediate return; the mono variant ignores them)."""

    concat_prev: int = 0  # channels of other_feat, 0 = off
    reduced: int = 48
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, low_level_feat, other_feat=None, train=False):
        ax = self.axis_name
        x = resize_bilinear_align_corners(
            x, (low_level_feat.shape[1], low_level_feat.shape[2])
        )
        low = nn.Conv(self.reduced, (1, 1), use_bias=False,
                      kernel_init=he_fan_out, name="low_conv")(low_level_feat)
        low = nn.relu(_bn(self, train, ax, "low_bn")(low))
        middle = jnp.concatenate([x, low], axis=-1)
        if self.concat_prev:
            assert other_feat is not None
            oth = nn.Conv(64, (1, 1), use_bias=False, kernel_init=he_fan_out,
                          name="int_conv")(other_feat)
            middle = jnp.concatenate([middle, oth], axis=-1)
        y = SeparableConv(256, relu_first=False, axis_name=ax,
                          name="sep1")(middle, train)
        y = SeparableConv(256, relu_first=False, axis_name=ax,
                          name="sep2")(y, train)
        return y, middle


class SPPNetMono(nn.Module):
    """models_deeplab/net.py SPPNet — mono DeepLabV3+ ('deeplab')."""

    labels: int = 19
    enc_type: str = "xception65"
    # net.py:96-97: mobilenetv2 routes through create_mspp(dec_type) — the
    # default 'aspp' is the full separable ASPP(320,256,8), spp.py:147-148;
    # 'maspp' selects the 2-branch MobileASPP, spp.py:153-154.
    dec_type: str = "aspp"
    output_stride: int = 8
    encoder_bn_eps: float = 1e-3  # update_bn_eps applied by the factory
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, left, right=None, train: bool = False, **_):
        ax = self.axis_name
        if self.enc_type == "mobilenetv2":
            x = MobileNetV2Encoder(axis_name=ax, bn_eps=self.encoder_bn_eps,
                                   name="encoder")(left, train)
            if self.dec_type == "maspp":
                x = MobileASPP(axis_name=ax, name="spp")(x, train)
            else:
                x = ASPPDeeplab(256, self.output_stride, axis_name=ax,
                                name="spp")(x, train)
            logits = nn.Conv(self.labels, (1, 1), name="logits")(x)
        else:
            x, low = Xception65(self.output_stride, axis_name=ax,
                                bn_eps=self.encoder_bn_eps,
                                name="encoder")(left, train)
            x = ASPPDeeplab(256, self.output_stride, axis_name=ax,
                            name="spp")(x, train)
            x, _ = SPPDecoder(axis_name=ax, name="decoder")(x, low, None, train)
            logits = nn.Conv(self.labels, (1, 1), name="logits")(x)
        return {"seg1": logits, "disp1": None, "seg2": None, "disp2": None}


class SPPNetStereo(nn.Module):
    """models_deeplab_mod/net.py SPPNet — stereo DeepLabV3+ ('deeplab_mod'):
    three chained decoders (seg -> disp -> seg2)."""

    labels: int = 19
    output_stride: int = 8
    encoder_bn_eps: float = 1e-3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, left, right, train: bool = False, **_):
        ax = self.axis_name
        enc = Xception65(self.output_stride, extra_taps=True, axis_name=ax,
                         bn_eps=self.encoder_bn_eps, name="encoder")
        x, low, mid2, high3 = enc(left, train)
        _, _, mid2_b, _ = enc(right, train)

        x = ASPPDeeplab(256, self.output_stride, axis_name=ax,
                        name="spp")(x, train)
        x, int_seg = SPPDecoder(axis_name=ax, name="decoder")(x, low, None, train)

        conv2 = nn.Conv(256, (1, 1), use_bias=False, kernel_init=he_fan_out,
                        name="conv2")
        m_a = conv2(mid2)
        m_b = conv2(mid2_b)
        corr = correlation(m_a, m_b, (1, 17))
        corr = nn.relu(nn.Conv(44, (1, 1), use_bias=False,
                               kernel_init=he_fan_out, name="corrConv")(corr))
        m_a = jnp.concatenate([m_a, corr], axis=-1)  # 300 ch
        h3 = nn.Conv(256, (1, 1), use_bias=False, kernel_init=he_fan_out,
                     name="conv3")(high3)

        disp_x, int_disp = SPPDecoder(concat_prev=304, axis_name=ax,
                                      name="decoder2")(m_a, low, int_seg, train)
        seg2_x, _ = SPPDecoder(concat_prev=412, axis_name=ax,
                               name="decoder3")(h3, low, int_disp, train)

        seg = nn.Conv(self.labels, (1, 1), name="logits")(x)
        disp = nn.Conv(1, (1, 1), name="logits_disp")(disp_x)
        seg2 = nn.Conv(self.labels, (1, 1), name="logits_seg")(seg2_x)
        return {"seg1": seg, "disp1": disp, "seg2": seg2, "disp2": disp}


def deeplab_preprocess(left, right=None):
    """netForward 'deeplab' input path (torch_implementation.py:123-131):
    scale to [-1,1], pad bottom/right by 1. Returns processed + orig size."""
    h, w = left.shape[1], left.shape[2]
    left = left * 2.0 - 1.0
    left = jnp.pad(left, ((0, 0), (0, 1), (0, 1), (0, 0)))
    if right is not None:
        right = jnp.pad(right, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return left, right, (h, w)


def deeplab_postprocess(logits, hw):
    """Upsample to (h+1, w+1) with align_corners=True then crop to (h, w)
    (torch_implementation.py:160-166)."""
    h, w = hw
    out = resize_bilinear_align_corners(logits, (h + 1, w + 1))
    return out[:, :h, :w, :]


@MODELS.register("deeplab")
def _make_deeplab(cfg, labels: int, axis_name=None):
    # the reference class supports enc_type mobilenetv2 (net.py:89); its CLI
    # always builds the xception65 default — we expose it via -backbone
    enc = "mobilenetv2" if cfg.backbone == "mobilenetv2" else "xception65"
    return SPPNetMono(labels=labels, enc_type=enc, axis_name=axis_name)


@MODELS.register("deeplab_mod")
def _make_deeplab_mod(cfg, labels: int, axis_name=None):
    return SPPNetStereo(labels=labels, axis_name=axis_name)
