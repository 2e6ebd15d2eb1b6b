"""Warp model family — seg heads blended via learned attention over a
disparity-warped right-view prediction.

Reference: models/dsnet_t2_warp.py (minidsnetDivide :577-703,
minidsnetDivideSoftmax :169-309, minidsnetDivideDisp :704-836,
minidsnetDivideDisp2 :839-972, SmallsegNet :144-167) and
models/dsnet_t2.py seg_dsnet (:2087-2177). The CUDA flattened-index
``apply_disparity`` gather becomes ops.warp.apply_disparity.

Output dict keys follow the driver mapping for 'ThreeOutPuts*'
(torch_implementation.py:157-158): seg1/disp1/seg2/seg3(+warped_right).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.registry import MODELS
from ..ops.correlation import correlation
from ..ops.resize import resize_bilinear, resize_nearest, upsample_nearest
from ..ops.warp import apply_disparity
from .blocks import Conv2DownUp, ConvBN, ConvOut
from .pyramid import PiramidNet2Warp

# (segnet_input = b3 channels, segnet_feature = b1 channels) per backbone
# (dsnet_t2_warp.py:595-603)
_WARP_DIMS = {
    "densenet": (576, 256),
    "resnet50": (1088, 384),
    "resnet101": (1088, 384),
    "mobilenet": (176, 152),
}


class SmallSegHead(nn.Module):
    """SmallsegNet (dsnet_t2_warp.py:144-167): no initial x2 upsample;
    returns (x after cdu1, x1_1 after the low-level concat conv, seg)."""

    labels: int
    log_softmax_out: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, full_hw, xleft, train: bool = False):
        x = nn.relu(
            ConvBN(64, 1, batchnorm=False, axis_name=self.axis_name,
                   name="conv1d_1")(x, train)
        )
        x = Conv2DownUp(32, 3, axis_name=self.axis_name, name="cdu1")(x, train)
        x1_1 = resize_nearest(x, (xleft.shape[1], xleft.shape[2]))
        x1_1 = jnp.concatenate([x1_1, xleft], axis=-1)
        x1_1 = nn.relu(
            ConvBN(32, 1, batchnorm=False, axis_name=self.axis_name,
                   name="conv1d_2")(x1_1, train)
        )
        seg = Conv2DownUp(32, 3, last_layer=False, axis_name=self.axis_name,
                          name="cdu2")(x1_1, train)
        seg = ConvOut(self.labels, 3, name="out")(seg)
        seg = resize_nearest(seg, full_hw)
        return x, x1_1, seg


class _WarpCommon(nn.Module):
    """Shared trunk: warp-pyramid features + corr disp decoder."""

    cfg: ModelConfig
    labels: int
    axis_name: Optional[str] = None

    def _patch(self):
        return (1, 17) if self.cfg.corr_type == "1dcorr" else (17, 17)

    def disp_decoder(self, x, a_py2, b_py2, xleft2, full_hw, train):
        """corr -> Conv2DownUp stack -> disparity (dsnet_t2_warp.py:664-684).
        ``x`` is the 32-ch /16 feature from the seg head."""
        ax = self.axis_name
        y = correlation(a_py2, b_py2, self._patch(),
                        normalize=(self.cfg.corr_type != "1dcorr"))
        y = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                           name="corrConv2d")(y, train))
        y1 = Conv2DownUp(128, 3, axis_name=ax, name="cdu3")(x, train)
        y1 = resize_bilinear(y1, (y.shape[1], y.shape[2]))
        y = jnp.concatenate([y1, y], axis=-1)
        y = Conv2DownUp(64, 3, axis_name=ax, name="cdu4")(y, train)
        y2 = upsample_nearest(y, 8)
        xl2 = resize_bilinear(xleft2, (y2.shape[1], y2.shape[2]))
        disp = jnp.concatenate([y2, xl2], axis=-1)
        disp = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                              name="conv1d_2")(disp, train))
        disp = Conv2DownUp(64, 5, last_layer=False, axis_name=ax,
                           name="cdu5")(disp, train)
        disp = ConvOut(1, 5, name="dispoutConv")(disp)
        return resize_bilinear(disp, full_hw), y


class MiniDSNetDivide(_WarpCommon):
    """dsnet_warp / minidsnetDivide (dsnet_t2_warp.py:577-700): left + right
    seg predictions blended by a sigmoid attention mask; the right seg is
    warped into the left view by the predicted disparity."""

    @nn.compact
    def __call__(self, input_a, input_b, train: bool = False, **_):
        ax = self.axis_name
        full_hw = (input_a.shape[1], input_a.shape[2])
        pyr = PiramidNet2Warp(backbone=self.cfg.backbone, axis_name=ax,
                              name="features")
        a = pyr(input_a, train)
        b = pyr(input_b, train)
        _, _, _, _, _, a_py0, a_py1, a_py2, a_py3 = a
        _, _, _, _, _, b_py0, b_py1, b_py2, b_py3 = b

        xleft2 = nn.relu(ConvBN(1, 5, dilation=2, axis_name=ax,
                                name="conv2d_ba1")(input_a, train))
        head = SmallSegHead(self.labels, axis_name=ax, name="segNet")
        x, x1_1, seg_left = head(a_py3, full_hw, a_py1, train)
        _, _, seg_right = head(b_py3, full_hw, b_py1, train)

        disp_out, y = self.disp_decoder(x, a_py2, b_py2, xleft2, full_hw, train)

        y3 = resize_nearest(y, (x1_1.shape[1], x1_1.shape[2]))
        s2_d = jnp.concatenate([x1_1, y3], axis=-1)  # 96 ch
        s2_d = Conv2DownUp(64, 3, axis_name=ax, name="cdu7")(s2_d, train)
        at_d = nn.sigmoid(ConvBN(1, 1, batchnorm=False, axis_name=ax,
                                 name="conv1d_at_d")(s2_d, train))
        at_d = resize_nearest(at_d, full_hw)
        seg_right_w = apply_disparity(seg_right, -disp_out)
        seg_both = (1.0 - at_d) * seg_left + at_d * seg_right_w
        return {"seg1": seg_both, "disp1": disp_out, "seg2": seg_left,
                "disp2": disp_out, "seg3": seg_right_w, "warped_right": at_d}


class MiniDSNetDivideSoftmax(_WarpCommon):
    """dsnet_warp_soft (dsnet_t2_warp.py:169-308): per-class softmax blend;
    seg head taps the /2 pyramid map."""

    @nn.compact
    def __call__(self, input_a, input_b, train: bool = False, **_):
        ax = self.axis_name
        full_hw = (input_a.shape[1], input_a.shape[2])
        pyr = PiramidNet2Warp(backbone=self.cfg.backbone, axis_name=ax,
                              name="features")
        a = pyr(input_a, train)
        b = pyr(input_b, train)
        _, _, _, _, _, a_py0, a_py1, a_py2, a_py3 = a
        _, _, _, _, _, b_py0, b_py1, b_py2, b_py3 = b

        xleft2 = nn.relu(ConvBN(1, 5, dilation=2, axis_name=ax,
                                name="conv2d_ba1")(input_a, train))
        head = SmallSegHead(self.labels, axis_name=ax, name="segNet")
        # softmax variant feeds the LEFT b0 map to both heads
        # (dsnet_t2_warp.py:242-243)
        x, x1_1, seg_left = head(a_py3, full_hw, a_py0, train)
        _, _, seg_right = head(b_py3, full_hw, a_py0, train)

        disp_out, y = self.disp_decoder(x, a_py2, b_py2, xleft2, full_hw, train)

        y3 = resize_nearest(y, (x1_1.shape[1], x1_1.shape[2]))
        s2_d = jnp.concatenate([x1_1, y3], axis=-1)
        at = Conv2DownUp(64, 3, last_layer=False, axis_name=ax,
                         name="cdu7")(s2_d, train)
        at = ConvOut(self.labels, 3, name="cdu7_out")(at)
        at = resize_nearest(at, full_hw)
        at = nn.softmax(at, axis=-1)
        seg_right_w = apply_disparity(seg_right, -disp_out)
        seg_both = (1.0 - at) * seg_left + at * seg_right_w
        return {"seg1": seg_left, "disp1": disp_out, "seg2": seg_both,
                "disp2": disp_out, "seg3": seg_right_w, "warped_right": at}


class MiniDSNetDivideDisp(_WarpCommon):
    """dsnet_warp_disp (dsnet_t2_warp.py:704-836): the right IMAGE is warped
    into the left view with GT disparity before the second backbone pass."""

    use_predicted_disp: bool = False  # True -> minidsnetDivideDisp2

    @nn.compact
    def __call__(self, input_a, input_b, train: bool = False,
                 disp_gt: Optional[jnp.ndarray] = None, **_):
        ax = self.axis_name
        full_hw = (input_a.shape[1], input_a.shape[2])
        pyr = PiramidNet2Warp(backbone=self.cfg.backbone, axis_name=ax,
                              name="features")
        a = pyr(input_a, train)
        _, _, _, _, _, a_py0, a_py1, a_py2, a_py3 = a
        b_py2 = pyr(input_b, train)[7]

        xleft2 = nn.relu(ConvBN(1, 5, dilation=2, axis_name=ax,
                                name="conv2d_ba1")(input_a, train))
        head = SmallSegHead(self.labels, axis_name=ax, name="segNet")
        x, x1_1, seg_left = head(a_py3, full_hw, a_py1, train)

        disp_out, y = self.disp_decoder(x, a_py2, b_py2, xleft2, full_hw, train)

        if self.use_predicted_disp:
            warped_right = apply_disparity(input_b, -disp_out)
        else:
            assert disp_gt is not None, "dsnet_warp_disp needs GT disparity"
            warped_right = apply_disparity(input_b, -disp_gt) * (
                disp_gt > 0
            ).astype(input_b.dtype)
        wb = pyr(warped_right, train)
        _, _, _, _, _, _, wb_py1, _, wb_py3 = wb
        _, x2_1, seg_right = head(wb_py3, full_hw, wb_py1, train)

        y3 = resize_nearest(y, (x1_1.shape[1], x1_1.shape[2]))
        s2_d = jnp.concatenate([x1_1, x2_1, y3], axis=-1)  # 128 ch
        s2_d = Conv2DownUp(64, 3, axis_name=ax, name="cdu7")(s2_d, train)
        at_d = nn.sigmoid(ConvBN(1, 1, batchnorm=False, axis_name=ax,
                                 name="conv1d_at_d")(s2_d, train))
        at_d = resize_nearest(at_d, full_hw)
        seg_both = (1.0 - at_d) * seg_left + at_d * seg_right
        extra = warped_right if self.use_predicted_disp else at_d
        return {"seg1": seg_both, "disp1": disp_out, "seg2": seg_left,
                "disp2": disp_out, "seg3": seg_right, "warped_right": extra}


class SegDSNet(_WarpCommon):
    """sdnet_seg / seg_dsnet (dsnet_t2.py:2087-2177): per-view seg heads on
    the deepest tap (the segNet is SHARED between views, with the shared
    conv2d_ba0 image conv as skip); disp trained self-supervised
    (outputType smallOutWarp: L1 zeroed, photo-consistency instead). Uses
    the ORIGINAL piramidNet (:324-397) like minidsnet. We additionally
    return the disparity-warped right image as warped_right so the photo
    loss is well-defined (the reference's smallOutWarp dispatch leaves it
    None and would crash, torch_implementation.py:178-179 + 314-317)."""

    @nn.compact
    def __call__(self, input_a, input_b, train: bool = False, **_):
        from .pyramid import PiramidNetV1
        from .sdnet import SegNetHead

        ax = self.axis_name
        full_hw = (input_a.shape[1], input_a.shape[2])
        pyr = PiramidNetV1(axis_name=ax, name="features")
        a = pyr(input_a, train)
        b = pyr(input_b, train)
        a4, a_py2 = a[4], a[5]
        b4, b_py2 = b[4], b[5]

        ba0 = ConvBN(1, 5, dilation=2, axis_name=ax, name="conv2d_ba0")
        ba1 = ConvBN(1, 5, dilation=2, axis_name=ax, name="conv2d_ba1")
        xleft2 = nn.relu(ba1(input_a, train))
        xleft0 = nn.relu(ba0(input_a, train))
        xright0 = nn.relu(ba0(input_b, train))

        head = SegNetHead(self.labels, axis_name=ax, name="segNet")
        x, x1, seg_left = head(a4, full_hw, xleft0, train)
        _, _, seg_right = head(b4, full_hw, xright0, train)

        disp_out, _ = self.disp_decoder(x1, a_py2, b_py2, xleft2, full_hw, train)
        seg_right_w = apply_disparity(seg_right, -disp_out)
        warped_right = apply_disparity(input_b, -disp_out)
        return {"seg1": seg_left, "disp1": disp_out, "seg2": seg_right_w,
                "disp2": disp_out, "warped_right": warped_right}


@MODELS.register("dsnet_warp")
def _mk_divide(cfg, labels, axis_name=None):
    return MiniDSNetDivide(cfg=cfg, labels=labels, axis_name=axis_name)


@MODELS.register("dsnet_warp_soft")
def _mk_divide_soft(cfg, labels, axis_name=None):
    return MiniDSNetDivideSoftmax(cfg=cfg, labels=labels, axis_name=axis_name)


@MODELS.register("dsnet_warp_disp")
def _mk_divide_disp(cfg, labels, axis_name=None):
    return MiniDSNetDivideDisp(cfg=cfg, labels=labels, axis_name=axis_name)


@MODELS.register("dsnet_warp_disp_consist")
def _mk_divide_disp2(cfg, labels, axis_name=None):
    return MiniDSNetDivideDisp(cfg=cfg, labels=labels, axis_name=axis_name,
                               use_predicted_disp=True)


@MODELS.register("sdnet_seg")
def _mk_seg_dsnet(cfg, labels, axis_name=None):
    return SegDSNet(cfg=cfg, labels=labels, axis_name=axis_name)
