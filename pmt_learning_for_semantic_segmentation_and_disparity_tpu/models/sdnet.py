"""The SDNet family — joint segmentation + disparity two-head stereo nets.

TPU-native re-design of models/dsnet_t2.py. All modules are NHWC flax; the
CUDA ``SpatialCorrelationSampler`` is replaced by ops.correlation (Pallas on
TPU); interpolation modes follow the reference call-for-call (nearest unless
noted bilinear).

Outputs use a dict with the reference's head structure:
  seg1   — segNet head (log-softmax applied by the loss, not here)
  disp1  — disparity head
  seg2   — refined seg head (the one whose IoU selects 'best' checkpoints)
  mt     — optional (loss_disp, loss_seg1, loss_seg2) Kendall terms
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.registry import MODELS
from ..losses.multitask import multitask_loss
from ..ops.correlation import correlation
from ..ops.resize import resize_bilinear, resize_nearest, upsample_nearest
from ..ops.s2d import (
    depth_to_space,
    s2d_concat,
    space_to_depth,
    tile_phases,
    to_s2d_nearest,
)
from .blocks import Conv2DownUp, ConvBN, ConvOut, SameConv, he_fan_out
from .pyramid import PiramidNet2, PiramidNetV1


def _even_hw(hw: Tuple[int, int]) -> bool:
    return hw[0] % 2 == 0 and hw[1] % 2 == 0

# (segnet_input, inplane_seg2 @ aspp0) per backbone — dsnet_t2.py:954-1053
_BACKBONE_DIMS = {
    "densenet": (2048, 512),
    "dn169": (3328, 512),
    "dn201": (3840, 512),
    "dn161": (4416, 640),
    "mobilenet": (320, 304),
    "resnet50": (512, 768),
    "resnet101": (512, 768),
    "efficientnet-b5": (4096, 512),
    "efficientnet-b4": (3584, 320),
    "efficientnet-b3": (3072, 320),
    "efficientnet-b2": (2816, 304),
}


class SegNetHead(nn.Module):
    """segNet (dsnet_t2.py:915-938): coarse seg decoder over cat(a4, b4).

    Returns (x @ deepest/2, x1 @ deepest/4, seg logits @ full res)."""

    labels: int
    dropout: float = 0.0
    axis_name: Optional[str] = None
    use_s2d: bool = False

    @nn.compact
    def __call__(self, x, full_hw: Tuple[int, int], xleft, train: bool = False):
        x = upsample_nearest(x, 2)
        x = nn.relu(
            ConvBN(64, 1, batchnorm=False, axis_name=self.axis_name,
                   name="conv1d_1")(x, train)
        )
        x = Conv2DownUp(32, 3, dropout=self.dropout, axis_name=self.axis_name,
                        name="cdu1")(x, train)
        x1 = upsample_nearest(x, 2)
        xl_hw = (xleft.shape[1], xleft.shape[2])
        if self.use_s2d and _even_hw(xl_hw):
            # identical chain in the space-to-depth domain (ops/s2d.py):
            # the full-res 32-ch convs fill the MXU tiles this way
            x1_1 = s2d_concat([to_s2d_nearest(x, xl_hw),
                               space_to_depth(xleft)])
            x1_1 = nn.relu(
                ConvBN(32, 1, batchnorm=False, axis_name=self.axis_name,
                       name="conv1d_2")(x1_1, train, s2d=True)
            )
            seg = Conv2DownUp(32, 3, last_layer=False, dropout=self.dropout,
                              axis_name=self.axis_name, name="cdu2")(
                x1_1, train, s2d=True)
            seg = ConvOut(self.labels, 3, name="out")(seg, s2d=True)
            seg = depth_to_space(seg)
        else:
            x1_1 = resize_nearest(x, xl_hw)
            x1_1 = jnp.concatenate([x1_1, xleft], axis=-1)
            x1_1 = nn.relu(
                ConvBN(32, 1, batchnorm=False, axis_name=self.axis_name,
                       name="conv1d_2")(x1_1, train)
            )
            seg = Conv2DownUp(32, 3, last_layer=False, dropout=self.dropout,
                              axis_name=self.axis_name, name="cdu2")(x1_1, train)
            seg = ConvOut(self.labels, 3, name="out")(seg)
        seg = resize_nearest(seg, full_hw)
        return x, x1, seg


class MiniDSNetExt(nn.Module):
    """minidsnetExt (dsnet_t2.py:941-1299) — the flagship.

    Supports aspp modes 0/1/2, cross-task attention gates (use_att),
    no_dec1/no_dec3 ablations, convDeconvOut duplexing, Kendall multitask
    modes 1/2, and the 4th edge input channel.
    """

    cfg: ModelConfig
    labels: int = 2
    axis_name: Optional[str] = None
    # "ext" (minidsnetExt) | "v2" (minidsnetExt2: single self-gate,
    # dsnet_t2.py:1888-1891) | "piramid" (ExtPiramid: cross gates + pyramid
    # final skip, :1547-1559) | "piramid_res" (ExtPiramidRes: residual corr
    # + additive gate fusion + extra output conv, :2340-2392)
    variant: str = "ext"

    @nn.compact
    def __call__(
        self,
        input_a: jnp.ndarray,
        input_b: jnp.ndarray,
        train: bool = False,
        pos=None,
        disp_gt: Optional[jnp.ndarray] = None,
        seg_labels: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        m = self.cfg
        ax = self.axis_name
        dropout = m.dropout
        aspp_mod = m.aspp
        backbone = m.backbone
        segnet_input, inplane_seg2 = _BACKBONE_DIMS[backbone]
        patch = (1, 17) if m.corr_type == "1dcorr" else (17, 17)
        ablation = m.ablation or ()

        left = input_a[..., :3] if m.edges else input_a
        right = input_b[..., :3] if m.edges else input_b
        full_hw = (left.shape[1], left.shape[2])
        use_s2d = bool(getattr(m, "s2d_heads", True)) and _even_hw(full_hw)

        pyr = PiramidNet2(backbone=backbone, axis_name=ax, name="features")
        if train:
            # separate passes: BN batch stats per view, like the reference's
            # two forward calls
            a0, a1, a2, a3, a4, a_py2, a_py1, a_py0 = pyr(left, train)
            b0, b1, b2, b3, b4, b_py2, b_py1, b_py0 = pyr(right, train)
        else:
            # eval: BN uses running stats, so stacking L/R into the batch is
            # EXACTLY equivalent — and doubles the conv batch (better MXU
            # utilization, half the kernel launches)
            nb = left.shape[0]
            both = pyr(jnp.concatenate([left, right], axis=0), train)
            a0, a1, a2, a3, a4, a_py2, a_py1, a_py0 = (t[:nb] for t in both)
            b0, b1, b2, b3, b4, b_py2, b_py1, b_py0 = (t[nb:] for t in both)

        # Kendall decoder-only mode (dsnet_t2.py:1162-1168)
        if m.multaskloss == 2:
            d = ConvBN(256, 1, relu=True, axis_name=ax, name="mt_disp_c1")(a4, train)
            d = nn.Conv(1, (3, 3), padding="SAME", use_bias=False,
                        name="mt_disp_c2")(d)
            s = ConvBN(256, 1, relu=True, axis_name=ax, name="mt_seg_c1")(a4, train)
            s = nn.Conv(self.labels, (3, 3), padding="SAME", use_bias=False,
                        name="mt_seg_c2")(s)
            d = resize_bilinear(d, full_hw)
            s = resize_nearest(s, full_hw)
            lv_d = self.param("log_var_disp", nn.initializers.zeros, (1,))
            lv_s1 = self.param("log_var_seg1", nn.initializers.zeros, (1,))
            mt = multitask_loss(lv_d, lv_s1, None, d, disp_gt, s, None, seg_labels)
            return {"seg1": s, "disp1": d, "seg2": s, "disp2": d, "mt": mt}

        # 5x5 dilation-2 single-channel image convs (dsnet_t2.py:1176-1179).
        # The reference runs FOUR independent 3->1 convs on the same input;
        # one 3->4 conv with per-channel BN is the identical function family
        # and 4x cheaper on TPU (tiny-channel full-res convs pad the lane
        # dim to 128 — the profiler showed each costing ~18ms at 512x960).
        xleft_all = nn.relu(
            ConvBN(4, 5, dilation=2, axis_name=ax, name="conv2d_ba")(
                input_a, train
            )
        )
        xleft0 = xleft_all[..., 0:1]
        xleft1 = xleft_all[..., 1:2]
        xleft2 = xleft_all[..., 2:3]
        # channel 3 == the reference's unused xleft3 (kept for parity)

        if backbone in ("resnet50", "resnet101"):
            from .aspp import ASPP

            aspp4 = ASPP(output_stride=16, axis_name=ax, name="aspp_4")
            a4 = aspp4(a4, train)
            b4 = aspp4(b4, train)

        # head 1: coarse seg decoder on concatenated deepest features
        x = jnp.concatenate([a4, b4], axis=-1)
        x, x1, seg_branch = SegNetHead(
            self.labels, dropout=dropout, axis_name=ax, use_s2d=use_s2d,
            name="segNet"
        )(x, full_hw, xleft0, train)

        # cost volume at 1/8 (pyramid-enriched tap 2) — Pallas on TPU
        y = correlation(
            a_py2, b_py2, patch, normalize=(m.corr_type != "1dcorr")
        )
        if self.variant == "piramid_res":
            # residual corr fusion (dsnet_t2.py:2340-2345)
            y = nn.relu(ConvBN(a_py2.shape[-1], 1, batchnorm=False,
                               axis_name=ax, name="corrConv2d")(y, train))
            y = a_py2 + y
            y1 = Conv2DownUp(a_py2.shape[-1], 3, dropout=dropout, axis_name=ax,
                             name="cdu3")(x1, train)
            y1 = resize_bilinear(y1, (y.shape[1], y.shape[2]))
            y = y + y1
        else:
            y = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                               name="corrConv2d")(y, train))
            if "no_dec1" in ablation:
                y1 = Conv2DownUp(128, 3, dropout=dropout, axis_name=ax,
                                 name="cdu3")(a_py2, train)
            else:
                y1 = Conv2DownUp(128, 3, dropout=dropout, axis_name=ax,
                                 name="cdu3")(x1, train)
            y1 = resize_bilinear(y1, (y.shape[1], y.shape[2]))
            y = jnp.concatenate([y1, y], axis=-1)
        y = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax, name="cdu4")(y, train)

        # disparity head. s2d path: s2d(upsample8(y)) == tile(upsample4(y)),
        # so the 64-ch full-res 5x5 chain never leaves the s2d domain —
        # identical math (ops/s2d.py), ~full MXU lanes.
        if use_s2d:
            y2 = tile_phases(upsample_nearest(y, 4))
            xl2 = space_to_depth(resize_bilinear(
                xleft2, (2 * y2.shape[1], 2 * y2.shape[2])))
            disp = s2d_concat([y2, xl2])
            disp = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                                  name="conv1d_2")(disp, train, s2d=True))
            disp = Conv2DownUp(64, 5, last_layer=False, dropout=dropout,
                               axis_name=ax, name="cdu5")(disp, train,
                                                          s2d=True)
            disp = ConvOut(1, 5, name="dispoutConv")(disp, s2d=True)
            disp = depth_to_space(disp)
        else:
            y2 = upsample_nearest(y, 8)
            xl2 = resize_bilinear(xleft2, (y2.shape[1], y2.shape[2]))
            disp = jnp.concatenate([y2, xl2], axis=-1)
            disp = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                                  name="conv1d_2")(disp, train))
            disp = Conv2DownUp(64, 5, last_layer=False, dropout=dropout,
                               axis_name=ax, name="cdu5")(disp, train)
            disp = ConvOut(1, 5, name="dispoutConv")(disp)
        disp_out = resize_bilinear(disp, full_hw)

        # head 2 feature selection by aspp mode (dsnet_t2.py:1226-1237)
        if aspp_mod == 1:
            from .aspp import ASPP

            s2 = ASPP(output_stride=32, axis_name=ax, name="aspp")(a1, train)
            feature_channel = 1
        elif aspp_mod == 2:
            from .aspp import ASPP

            aspp = ASPP(output_stride=32, axis_name=ax, name="aspp")
            s2_1 = aspp(a3, train)
            s2_2 = aspp(b3, train)
            s2_corr = correlation(s2_1, s2_2, (1, 17))
            s2 = jnp.concatenate([s2_corr, s2_1], axis=-1)
            feature_channel = 64
        else:
            s2 = jnp.concatenate([a_py1, b_py1], axis=-1)
            feature_channel = 1

        s2 = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_4")(s2, train))
        s2 = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax, name="cdu6")(s2, train)

        y3 = resize_nearest(y, (s2.shape[1], s2.shape[2]))

        if "no_dec3" not in ablation:
            if self.variant == "v2":
                # single self-gate (dsnet_t2.py:1861-1866)
                s2_d = jnp.concatenate([s2, y3], axis=-1)
                s2_d = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax,
                                   name="cdu7")(s2_d, train)
                x3 = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax,
                                 name="cdu8")(x1, train)
                x3 = resize_nearest(x3, (s2.shape[1], s2.shape[2]))
                s2_s = jnp.concatenate([s2, x3], axis=-1)
                s2_s = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax,
                                   name="cdu9")(s2_s, train)
                s2_at = nn.sigmoid(ConvBN(1, 1, batchnorm=False, axis_name=ax,
                                          name="conv1d_at")(s2, train))
                s2 = jnp.concatenate(
                    [s2_d * s2_at, s2_s * (1.0 - s2_at)], axis=-1
                )
            elif self.variant == "piramid_res":
                # additive gate fusion (dsnet_t2.py:2375-2377)
                s2_d = jnp.concatenate([s2, y3], axis=-1)
                s2_d = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax,
                                   name="cdu7")(s2_d, train)
                at_d = nn.sigmoid(ConvBN(1, 1, batchnorm=False, axis_name=ax,
                                         name="conv1d_at_d")(s2_d, train))
                x3 = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax,
                                 name="cdu8")(x1, train)
                x3 = resize_nearest(x3, (s2.shape[1], s2.shape[2]))
                s2_s = jnp.concatenate([s2, x3], axis=-1)
                s2_s = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax,
                                   name="cdu9")(s2_s, train)
                at_s = nn.sigmoid(ConvBN(1, 1, batchnorm=False, axis_name=ax,
                                         name="conv1d_at_s")(s2_s, train))
                s2 = s2 + (x3 * at_s + y3 * at_d)
            elif m.use_att:
                s2_d = jnp.concatenate([s2, y3], axis=-1)
                s2_d = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax,
                                   name="cdu7")(s2_d, train)
                at_d = nn.sigmoid(
                    ConvBN(1, 1, batchnorm=False, axis_name=ax,
                           name="conv1d_at_d")(s2_d, train)
                )
                at_d = nn.Dropout(dropout, deterministic=not train)(at_d)
                x3 = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax,
                                 name="cdu8")(x1, train)
                x3 = resize_nearest(x3, (s2.shape[1], s2.shape[2]))
                s2_s = jnp.concatenate([s2, x3], axis=-1)
                s2_s = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax,
                                   name="cdu9")(s2_s, train)
                at_s = nn.sigmoid(
                    ConvBN(1, 1, batchnorm=False, axis_name=ax,
                           name="conv1d_at_s")(s2_s, train)
                )
                at_s = nn.Dropout(dropout, deterministic=not train)(at_s)
                s2 = jnp.concatenate([s2_d * at_s, s2_s * at_d], axis=-1)
            else:
                x3 = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax,
                                 name="cdu8")(x1, train)
                x3 = resize_nearest(x3, (s2.shape[1], s2.shape[2]))
                s2 = jnp.concatenate([s2, x3, y3], axis=-1)
        s2 = Conv2DownUp(64, 3, dropout=dropout, axis_name=ax, name="cdu10")(s2, train)

        cdu11_ch = 64 if self.variant == "piramid_res" else 32
        if aspp_mod == 2:
            a0_hw = (a0.shape[1], a0.shape[2])
            if use_s2d and _even_hw(a0_hw):
                s2_s = s2d_concat([to_s2d_nearest(s2, a0_hw),
                                   space_to_depth(a0)])
                sb2 = nn.relu(ConvBN(32, 1, batchnorm=False, axis_name=ax,
                                     name="conv1d_5")(s2_s, train, s2d=True))
                sb2 = Conv2DownUp(cdu11_ch, 3, last_layer=False,
                                  dropout=dropout,
                                  axis_name=ax, name="cdu11")(sb2, train,
                                                              s2d=True)
                sb2 = ConvOut(self.labels, 3, name="cdu11_out")(sb2, s2d=True)
                sb2 = depth_to_space(sb2)
            else:
                s2 = resize_nearest(s2, a0_hw)
                s2 = jnp.concatenate([s2, a0], axis=-1)
                sb2 = nn.relu(ConvBN(32, 1, batchnorm=False, axis_name=ax,
                                     name="conv1d_5")(s2, train))
                sb2 = Conv2DownUp(cdu11_ch, 3, last_layer=False,
                                  dropout=dropout,
                                  axis_name=ax, name="cdu11")(sb2, train)
                sb2 = ConvOut(self.labels, 3, name="cdu11_out")(sb2)
            seg_branch2 = resize_nearest(sb2, full_hw)
        else:
            if self.variant in ("piramid", "piramid_res"):
                # pyramid-enriched /2 map as the final skip
                # (dsnet_t2.py:1557-1559, 2386-2388)
                fskip = a_py0
            else:
                fskip = xleft1
            fskip_hw = (fskip.shape[1], fskip.shape[2])
            chain_s2d = use_s2d and _even_hw(fskip_hw)
            if chain_s2d:
                s2 = s2d_concat([to_s2d_nearest(s2, fskip_hw),
                                 space_to_depth(fskip)])
            else:
                s2 = resize_nearest(s2, fskip_hw)
                s2 = jnp.concatenate([s2, fskip], axis=-1)
            sb2 = nn.relu(ConvBN(32, 1, batchnorm=False, axis_name=ax,
                                 name="conv1d_5")(s2, train, s2d=chain_s2d))
            # piramid_res widens the final Conv2DownUp to 64 ch before its
            # plain convSegOut head (dsnet_t2.py:2304-2305)
            sb2 = Conv2DownUp(cdu11_ch, 3, last_layer=False,
                              dropout=dropout if not m.conv_deconv_out else 0.0,
                              axis_name=ax, name="cdu11")(sb2, train,
                                                          s2d=chain_s2d)
            if m.conv_deconv_out:
                sb2_2 = SameConv(self.labels, (3, 3), use_bias=False,
                                 kernel_init=he_fan_out,
                                 name="convOutput2")(sb2, s2d=chain_s2d)
                if m.conv_deconv_out == 2:
                    sb2_1 = ConvOut(self.labels, 3, name="convOutput")(
                        sb2, s2d=chain_s2d)
                else:
                    sb2_1 = 0.0
                seg_branch2 = sb2_1 + sb2_2
            else:
                seg_branch2 = ConvOut(self.labels, 3, name="cdu11_out")(
                    sb2, s2d=chain_s2d)
            if chain_s2d:
                seg_branch2 = depth_to_space(seg_branch2)
            if self.variant in ("piramid", "piramid_res"):
                # these variants resize the head output back to full res
                # with nearest (dsnet_t2.py:1562, 2392)
                seg_branch2 = resize_nearest(seg_branch2, full_hw)

            if m.hanet:
                from .hanet import HANetConv

                seg_branch2, _ = HANetConv(
                    out_channels=self.labels, pooling="max", pos_rfactor=2,
                    dropout_prob=0.1, is_encoding=m.hanet_is_encoding,
                    pos_noise=m.hanet_pos_noise, name="hanet_last",
                )(a0, seg_branch2, pos, train=train)

        out = {"seg1": seg_branch, "disp1": disp_out,
               "seg2": seg_branch2, "disp2": disp_out}
        if m.multaskloss:
            lv_d = self.param("log_var_disp", nn.initializers.zeros, (1,))
            lv_s1 = self.param("log_var_seg1", nn.initializers.zeros, (1,))
            lv_s2 = self.param("log_var_seg2", nn.initializers.zeros, (1,))
            out["mt"] = multitask_loss(
                lv_d, lv_s1, lv_s2, disp_out, disp_gt,
                seg_branch, seg_branch2, seg_labels,
            )
        return out


class MiniDSNet(nn.Module):
    """minidsnet (dsnet_t2.py:825-912): single seg + disp head, outputs
    duplicated (outputType smallOutPair). Uses the ORIGINAL piramidNet
    (:324-397, densenet-only, no enriched tap1) like the reference — its
    b2 tap (the 5th return) feeds the correlation."""

    cfg: ModelConfig
    labels: int = 2
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_a, input_b, train: bool = False, **_):
        m = self.cfg
        ax = self.axis_name
        patch = (1, 17) if m.corr_type == "1dcorr" else (17, 17)
        left = input_a[..., :3] if m.edges else input_a
        right = input_b[..., :3] if m.edges else input_b
        full_hw = (left.shape[1], left.shape[2])
        use_s2d = bool(getattr(m, "s2d_heads", True)) and _even_hw(full_hw)

        pyr = PiramidNetV1(axis_name=ax, name="features")
        a = pyr(left, train)
        b = pyr(right, train)
        a4, b4 = a[4], b[4]
        a_py2, b_py2 = a[5], b[5]

        # merged image convs (see MiniDSNetExt note)
        xleft_all = nn.relu(
            ConvBN(2, 5, dilation=2, axis_name=ax, name="conv2d_ba")(
                input_a, train
            )
        )
        xleft0 = xleft_all[..., 0:1]
        xleft2 = xleft_all[..., 1:2]

        x = jnp.concatenate([a4, b4], axis=-1)
        x, x1, seg_branch = SegNetHead(
            self.labels, axis_name=ax, use_s2d=use_s2d, name="segNet"
        )(x, full_hw, xleft0, train)

        y = correlation(a_py2, b_py2, patch, normalize=(m.corr_type != "1dcorr"))
        y = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                           name="corrConv2d")(y, train))
        y1 = Conv2DownUp(128, 3, axis_name=ax, name="cdu3")(x1, train)
        y1 = resize_bilinear(y1, (y.shape[1], y.shape[2]))
        y = jnp.concatenate([y1, y], axis=-1)
        y = Conv2DownUp(64, 3, axis_name=ax, name="cdu4")(y, train)

        if use_s2d:
            y2 = tile_phases(upsample_nearest(y, 4))
            xl2 = space_to_depth(resize_bilinear(
                xleft2, (2 * y2.shape[1], 2 * y2.shape[2])))
            disp = s2d_concat([y2, xl2])
            disp = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                                  name="conv1d_2")(disp, train, s2d=True))
            disp = Conv2DownUp(64, 5, last_layer=False, axis_name=ax,
                               name="cdu5")(disp, train, s2d=True)
            disp = ConvOut(1, 5, name="dispoutConv")(disp, s2d=True)
            disp = depth_to_space(disp)
        else:
            y2 = upsample_nearest(y, 8)
            xl2 = resize_bilinear(xleft2, (y2.shape[1], y2.shape[2]))
            disp = jnp.concatenate([y2, xl2], axis=-1)
            disp = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                                  name="conv1d_2")(disp, train))
            disp = Conv2DownUp(64, 5, last_layer=False, axis_name=ax,
                               name="cdu5")(disp, train)
            disp = ConvOut(1, 5, name="dispoutConv")(disp)
        disp_out = resize_bilinear(disp, full_hw)

        return {"seg1": seg_branch, "disp1": disp_out,
                "seg2": seg_branch, "disp2": disp_out}


@MODELS.register("sdnet_mini_ext")
def _make_ext(cfg: ModelConfig, labels: int, axis_name=None):
    return MiniDSNetExt(cfg=cfg, labels=labels, axis_name=axis_name)


@MODELS.register("sdnet_mini_ext_v2")
def _make_ext_v2(cfg: ModelConfig, labels: int, axis_name=None):
    return MiniDSNetExt(cfg=cfg, labels=labels, axis_name=axis_name,
                        variant="v2")


@MODELS.register("sdnet_mini_ext_piramid")
def _make_ext_piramid(cfg: ModelConfig, labels: int, axis_name=None):
    return MiniDSNetExt(cfg=cfg, labels=labels, axis_name=axis_name,
                        variant="piramid")


@MODELS.register("sdnet_mini_ext_piramid_res")
def _make_ext_piramid_res(cfg: ModelConfig, labels: int, axis_name=None):
    return MiniDSNetExt(cfg=cfg, labels=labels, axis_name=axis_name,
                        variant="piramid_res")


@MODELS.register("sdnet_mini")
def _make_mini(cfg: ModelConfig, labels: int, axis_name=None):
    return MiniDSNet(cfg=cfg, labels=labels, axis_name=axis_name)
