"""minidsnetExt_deeplab ('sdnet_mini_ext_dlab') — the Ext skeleton on a
HANet-style deeplabV3plus ResNet-101 feature extractor.

Reference: models/dsnet_t2.py:2426-2729 + models_hanet/resnet_pytorch.py:70-232.
The return_layers backbone yields (dec0_up 256@/8, high_level 1024@/8,
middle_level 512@/8, dec0_fine 48@/4), consumed as (a4, py2, py1, py0).
Our trunk is the dilated ResNet-101 (output_stride 8) with HANet's
ResNet3X3 stem — three 3x3 convs (64, 64, 128) then maxpool — and uniform
variant-'D' dilation, matching models_hanet/Resnet.py:137-221 +
resnet_pytorch.py:96-139 for weight-import parity.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.registry import MODELS
from ..ops.correlation import correlation
from ..ops.resize import resize_bilinear, resize_nearest, upsample_nearest
from .blocks import Conv2DownUp, ConvBN, ConvOut, bn_train_mode
from .resnet_deeplab import ResNetDeeplabFeatures
from .sdnet import SegNetHead


class HANetASPP(nn.Module):
    """_AtrousSpatialPyramidPoolingModule (models_hanet/resnet_pytorch.py:
    7-68) at output_stride 8: rates doubled to (12,24,36), concat order =
    (img_pool, 1x1, r12, r24, r36) — IMAGE POOLING FIRST — and NO final
    projection (bot_aspp projects outside). Img features upsample with
    bilinear align_corners=True (mynn.Upsample)."""

    axis_name: Optional[str] = None
    features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.resize import resize_bilinear_align_corners

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not bn_train_mode(self, train),
                momentum=0.9, epsilon=1e-5, axis_name=self.axis_name,
                dtype=None, name=name,
            )

        def branch(inp, k, d, name):
            pad = [(0, 0), (0, 0)] if k == 1 else [(d, d), (d, d)]
            y = nn.Conv(self.features, (k, k), kernel_dilation=(d, d),
                        padding=pad, use_bias=False,
                        kernel_init=nn.initializers.kaiming_normal(),
                        name=f"{name}_conv")(inp)
            return nn.relu(bn(f"{name}_bn")(y))

        img = jnp.mean(x, axis=(1, 2), keepdims=True)
        img = nn.Conv(256, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.kaiming_normal(),
                      name="img_conv")(img)
        img = nn.relu(bn("img_bn")(img))
        img = resize_bilinear_align_corners(img, (x.shape[1], x.shape[2]))
        outs = [img, branch(x, 1, 1, "feat0")]
        for i, r in enumerate((12, 24, 36)):
            outs.append(branch(x, 3, r, f"feat{i + 1}"))
        return jnp.concatenate(outs, axis=-1)


class DeeplabV3PlusFeatures(nn.Module):
    """deeplabV3plus(return_layers=True) equivalent
    (models_hanet/resnet_pytorch.py:70-232, trunk resnet-101 variant 'D'):
    ResNet3X3 stem, os=8, HANet ASPP, 1x1 bot_aspp/bot_fine projections.
    final1_1/final1_2/final2 exist in the torch net but return_layers=True
    never runs them."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = ResNetDeeplabFeatures(
            (3, 4, 23, 3), output_stride=8, axis_name=self.axis_name,
            stem="3x3x3", multigrid=False, name="trunk",
        )(x, train)
        _, low, middle, high, final = taps  # /2,/4,/8,/8,/8 (os=8)
        a = HANetASPP(axis_name=self.axis_name, name="aspp")(final, train)
        dec0_up = nn.relu(
            ConvBN(256, 1, axis_name=self.axis_name, name="bot_aspp")(a, train)
        )
        dec0_fine = nn.relu(
            ConvBN(48, 1, axis_name=self.axis_name, name="bot_fine")(low, train)
        )
        return dec0_up, high, middle, dec0_fine


class MiniDSNetExtDeeplab(nn.Module):
    cfg: ModelConfig
    labels: int = 2
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_a, input_b, train: bool = False, pos=None, **_):
        m = self.cfg
        ax = self.axis_name
        ablation = m.ablation or ()
        patch = (1, 17) if m.corr_type == "1dcorr" else (17, 17)
        left = input_a[..., :3] if m.edges else input_a
        full_hw = (left.shape[1], left.shape[2])

        feat = DeeplabV3PlusFeatures(axis_name=ax, name="features")
        a4, a_py2, a_py1, a_py0 = feat(left, train)
        _, b_py2, b_py1, b_py0 = feat(
            input_b[..., :3] if m.edges else input_b, train
        )

        x, x1, seg_branch = SegNetHead(
            self.labels, axis_name=ax, name="segNet"
        )(a4, full_hw, a_py0, train)

        y = correlation(a_py2, b_py2, patch,
                        normalize=(m.corr_type != "1dcorr"))
        y = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                           name="corrConv2d")(y, train))
        src = a_py2 if "no_dec1" in ablation else x1
        y1 = Conv2DownUp(128, 3, axis_name=ax, name="cdu3")(src, train)
        y1 = resize_bilinear(y1, (y.shape[1], y.shape[2]))
        y = jnp.concatenate([y1, y], axis=-1)
        y = Conv2DownUp(64, 3, axis_name=ax, name="cdu4")(y, train)

        y2 = upsample_nearest(y, 8)
        xl2 = resize_bilinear(a_py0, (y2.shape[1], y2.shape[2]))
        disp = jnp.concatenate([y2, xl2], axis=-1)
        disp = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                              name="conv1d_2")(disp, train))
        disp = Conv2DownUp(64, 5, last_layer=False, axis_name=ax,
                           name="cdu5")(disp, train)
        disp = ConvOut(1, 5, name="dispoutConv")(disp)
        disp_out = resize_bilinear(disp, full_hw)

        s2 = a_py1
        s2 = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_4")(s2, train))
        s2 = Conv2DownUp(64, 3, axis_name=ax, name="cdu6")(s2, train)
        y3 = resize_nearest(y, (s2.shape[1], s2.shape[2]))
        if "no_dec3" not in ablation:
            s2_d = jnp.concatenate([s2, y3], axis=-1)
            s2_d = Conv2DownUp(64, 3, axis_name=ax, name="cdu7")(s2_d, train)
            at_d = nn.sigmoid(ConvBN(1, 1, batchnorm=False, axis_name=ax,
                                     name="conv1d_at_d")(s2_d, train))
            x3 = Conv2DownUp(64, 3, axis_name=ax, name="cdu8")(x1, train)
            x3 = resize_nearest(x3, (s2.shape[1], s2.shape[2]))
            s2_s = jnp.concatenate([s2, x3], axis=-1)
            s2_s = Conv2DownUp(64, 3, axis_name=ax, name="cdu9")(s2_s, train)
            at_s = nn.sigmoid(ConvBN(1, 1, batchnorm=False, axis_name=ax,
                                     name="conv1d_at_s")(s2_s, train))
            s2 = jnp.concatenate([s2_d * at_s, s2_s * at_d], axis=-1)
        s2 = Conv2DownUp(64, 3, axis_name=ax, name="cdu10")(s2, train)

        s2 = resize_nearest(s2, (a_py0.shape[1], a_py0.shape[2]))
        s2 = jnp.concatenate([s2, a_py0], axis=-1)
        sb2 = nn.relu(ConvBN(32, 1, batchnorm=False, axis_name=ax,
                             name="conv1d_5")(s2, train))
        sb2 = Conv2DownUp(32, 3, last_layer=False, axis_name=ax,
                          name="cdu11")(sb2, train)
        if m.conv_deconv_out:
            sb2_up = resize_nearest(sb2, full_hw)
            sb2_2 = nn.Conv(self.labels, (3, 3), padding="SAME",
                            use_bias=False, name="convOutput2")(sb2_up)
            sb2_1 = (ConvOut(self.labels, 3, name="convOutput")(sb2_up)
                     if m.conv_deconv_out == 2 else 0.0)
            seg_branch2 = sb2_1 + sb2_2
        else:
            sb2 = ConvOut(self.labels, 3, name="cdu11_out")(sb2)
            seg_branch2 = resize_nearest(sb2, full_hw)
        if m.hanet:
            from .hanet import HANetConv

            seg_branch2, _ = HANetConv(
                out_channels=self.labels, pooling="max", pos_rfactor=2,
                dropout_prob=0.1, is_encoding=m.hanet_is_encoding,
                pos_noise=m.hanet_pos_noise, name="hanet_last",
            )(a_py0, seg_branch2, pos, train=train)

        return {"seg1": seg_branch, "disp1": disp_out,
                "seg2": seg_branch2, "disp2": disp_out}


@MODELS.register("sdnet_mini_ext_dlab")
def _mk_ext_dlab(cfg, labels, axis_name=None):
    return MiniDSNetExtDeeplab(cfg=cfg, labels=labels, axis_name=axis_name)
