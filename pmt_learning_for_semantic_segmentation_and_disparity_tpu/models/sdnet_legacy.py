"""The original two-head SDNet ('sdnet') and its v2 ('sdnetv2').

Reference: models/dsnet_t2.py dsnet (:119-321) and dsnetv2 (:402-616).
dsnet: densenet121 pyramid features, 17x17 2-D correlation at 1/8 scale
normalized by channels, coarse seg head from concatenated deepest features,
cascaded refinement with residual head mixing
(seg2 = 0.9*s2 + 0.1*s1 at :279, disp2 = 0.8*d2 + 0.2*d1 at :304).
dsnetv2 adds the segNet helper head, the 1-D correlation option and the
4-channel edge input (:418-423).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.registry import MODELS
from ..ops.correlation import correlation
from ..ops.resize import resize_bilinear, resize_nearest, upsample_nearest
from .blocks import Conv2DownUp, ConvBN, ConvOut, DeconvBN
from .pyramid import PiramidNetV1
from .sdnet import SegNetHead


class DSNet(nn.Module):
    """dsnet (dsnet_t2.py:119-321). Always 2-D 17x17 correlation."""

    cfg: ModelConfig
    labels: int = 2
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_a, input_b, train: bool = False, **_):
        ax = self.axis_name
        full_hw = (input_a.shape[1], input_a.shape[2])
        # the legacy piramidNet (dsnet_t2.py:324-397): no enriched tap1
        pyr = PiramidNetV1(axis_name=ax, name="features")
        a0, a1, a2, a3, a4, a_py2, a_py0 = pyr(input_a, train)
        b0, b1, b2, b3, b4, b_py2, b_py0 = pyr(input_b, train)

        def ba(name):
            return nn.relu(ConvBN(1, 5, dilation=2, axis_name=ax,
                                  name=name)(input_a, train))

        xleft3 = ba("conv2d_ba3")
        xleft2 = ba("conv2d_ba1")
        xleft1 = ba("conv2d_ba2")

        # head 1: coarse seg
        x = jnp.concatenate([a4, b4], axis=-1)
        x = upsample_nearest(x, 2)
        x = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                           name="conv1d_1")(x, train))
        x = Conv2DownUp(32, 3, axis_name=ax, name="cdu1")(x, train)
        x1 = upsample_nearest(x, 2)
        seg1 = Conv2DownUp(32, 3, last_layer=False, axis_name=ax,
                           name="cdu2")(x1, train)
        seg1 = ConvOut(self.labels, 3, name="cdu2_out")(seg1)
        seg1 = upsample_nearest(seg1, 8)
        seg1 = resize_bilinear(seg1, full_hw)
        seg1 = jax.nn.log_softmax(seg1, axis=-1)

        # 2-D correlation cost volume at 1/8
        y = correlation(a_py2, b_py2, (17, 17), normalize=True)
        y = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                           name="corrConv2d")(y, train))
        y1 = Conv2DownUp(128, 3, axis_name=ax, name="cdu3")(x1, train)
        y1 = resize_bilinear(y1, (y.shape[1], y.shape[2]))
        y = jnp.concatenate([y1, y], axis=-1)
        y = Conv2DownUp(64, 3, axis_name=ax, name="cdu4")(y, train)

        # disp head 1
        y2 = upsample_nearest(y, 8)
        xl2 = resize_bilinear(xleft2, (y2.shape[1], y2.shape[2]))
        d = jnp.concatenate([y2, xl2], axis=-1)
        d = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                           name="conv1d_2")(d, train))
        d = Conv2DownUp(64, 5, last_layer=False, axis_name=ax,
                        name="cdu5")(d, train)
        d = ConvOut(1, 5, name="dispoutConv")(d)
        disp1 = resize_bilinear(d, full_hw)

        # refined seg head (:252-279)
        xx = upsample_nearest(x, 4)
        y3 = upsample_nearest(y, 2)
        xx = resize_bilinear(xx, (y3.shape[1], y3.shape[2]))
        xx = jnp.concatenate([xx, y3], axis=-1)
        xx = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_3")(xx, train))
        xx = Conv2DownUp(64, 5, axis_name=ax, name="cdu6")(xx, train)
        xx = resize_bilinear(xx, (a1.shape[1], a1.shape[2]))
        xx = jnp.concatenate([xx, a1], axis=-1)
        xx = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_4")(xx, train))
        xx = nn.relu(DeconvBN(32, 3, stride=2, axis_name=ax,
                              name="deconv_ba1")(xx, train))
        x3 = xx
        xx = resize_bilinear(xx, (a0.shape[1], a0.shape[2]))
        xx = jnp.concatenate([xx, a0], axis=-1)
        xx = nn.relu(ConvBN(32, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_5")(xx, train))
        xx = nn.relu(DeconvBN(32, 3, stride=2, axis_name=ax,
                              name="deconv_ba2")(xx, train))
        xl1 = resize_bilinear(xleft1, (xx.shape[1], xx.shape[2]))
        xx = jnp.concatenate([xx, xl1], axis=-1)
        xx = nn.relu(ConvBN(32, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_6")(xx, train))
        s2 = Conv2DownUp(32, 5, last_layer=False, axis_name=ax,
                         name="cdu7")(xx, train)
        s2 = ConvOut(self.labels, 5, name="branchConv")(s2)
        s2 = jax.nn.log_softmax(s2, axis=-1)
        s2 = resize_bilinear(s2, full_hw)
        seg2 = 0.9 * s2 + 0.1 * seg1  # residual head mixing (:279)

        # refined disp head (:283-304)
        y4 = jnp.concatenate([a_py0, b_py0], axis=-1)
        y4 = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_9")(y4, train))
        yy = upsample_nearest(y, 4)
        yy = resize_bilinear(yy, (y4.shape[1], y4.shape[2]))
        yy = jnp.concatenate([y4, yy], axis=-1)
        y5 = Conv2DownUp(64, 3, axis_name=ax, name="cdu8")(x3, train)
        yy = resize_bilinear(yy, (y5.shape[1], y5.shape[2]))
        yy = jnp.concatenate([y5, yy], axis=-1)
        yy = Conv2DownUp(64, 3, axis_name=ax, name="cdu9")(yy, train)
        yy = upsample_nearest(yy, 2)
        xl3 = resize_bilinear(xleft3, (yy.shape[1], yy.shape[2]))
        d2 = jnp.concatenate([yy, xl3], axis=-1)
        d2 = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_8")(d2, train))
        d2 = Conv2DownUp(64, 5, last_layer=False, axis_name=ax,
                         name="cdu10")(d2, train)
        d2 = ConvOut(1, 5, name="cdu10_out")(d2)
        d2 = resize_bilinear(d2, full_hw)
        disp2 = 0.8 * d2 + 0.2 * disp1  # (:304)

        return {"seg1": seg1, "disp1": disp1, "seg2": seg2, "disp2": disp2}


class DSNetV2(nn.Module):
    """dsnetv2 (dsnet_t2.py:402-616): the full dsnet cascade (refined seg2 +
    refined disp2 heads, residual head mixing) with the segNet helper as
    head 1, the correlation patch switch and the 4-channel edge input.
    Quirks reproduced: the correlation is channel-normalized for BOTH patch
    types (:467-469), and the 0.9/0.1 mix blends a log-softmax seg2 with
    head 1's raw logits (:560-562 — segNet does not log-softmax)."""

    cfg: ModelConfig
    labels: int = 2
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_a, input_b, train: bool = False, **_):
        ax = self.axis_name
        m = self.cfg
        left = input_a[..., :3] if m.edges else input_a
        right = input_b[..., :3] if m.edges else input_b
        full_hw = (left.shape[1], left.shape[2])
        patch = (1, 17) if m.corr_type == "1dcorr" else (17, 17)

        # the legacy piramidNet (dsnet_t2.py:408, 324-397): no enriched tap1
        pyr = PiramidNetV1(axis_name=ax, name="features")
        a0, a1, a2, a3, a4, a_py2, a_py0 = pyr(left, train)
        b0, b1, b2, b3, b4, b_py2, b_py0 = pyr(right, train)

        def ba(name):
            return nn.relu(ConvBN(1, 5, dilation=2, axis_name=ax,
                                  name=name)(input_a, train))

        xleft3 = ba("conv2d_ba3")
        xleft2 = ba("conv2d_ba1")
        xleft1 = ba("conv2d_ba2")
        xleft0 = ba("conv2d_ba0")

        x = jnp.concatenate([a4, b4], axis=-1)
        x, x1, seg1 = SegNetHead(self.labels, axis_name=ax,
                                 name="segNet")(x, full_hw, xleft0, train)

        # normalized for both patch types (:467-469)
        y = correlation(a_py2, b_py2, patch, normalize=True)
        y = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                           name="corrConv2d")(y, train))
        y1 = Conv2DownUp(128, 3, axis_name=ax, name="cdu3")(x1, train)
        y1 = resize_bilinear(y1, (y.shape[1], y.shape[2]))
        y = jnp.concatenate([y1, y], axis=-1)
        y = Conv2DownUp(64, 3, axis_name=ax, name="cdu4")(y, train)

        # disp head 1
        y2 = upsample_nearest(y, 8)
        xl2 = resize_bilinear(xleft2, (y2.shape[1], y2.shape[2]))
        d = jnp.concatenate([y2, xl2], axis=-1)
        d = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                           name="conv1d_2")(d, train))
        d = Conv2DownUp(64, 5, last_layer=False, axis_name=ax,
                        name="cdu5")(d, train)
        d = ConvOut(1, 5, name="dispoutConv")(d)
        disp1 = resize_bilinear(d, full_hw)

        # refined seg head (dsnet cascade, :531-562)
        xx = upsample_nearest(x, 4)
        y3 = upsample_nearest(y, 2)
        xx = resize_bilinear(xx, (y3.shape[1], y3.shape[2]))
        xx = jnp.concatenate([xx, y3], axis=-1)
        xx = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_3")(xx, train))
        xx = Conv2DownUp(64, 5, axis_name=ax, name="cdu6")(xx, train)
        xx = resize_bilinear(xx, (a1.shape[1], a1.shape[2]))
        xx = jnp.concatenate([xx, a1], axis=-1)
        xx = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_4")(xx, train))
        xx = nn.relu(DeconvBN(32, 3, stride=2, axis_name=ax,
                              name="deconv_ba1")(xx, train))
        x3 = xx
        xx = resize_bilinear(xx, (a0.shape[1], a0.shape[2]))
        xx = jnp.concatenate([xx, a0], axis=-1)
        xx = nn.relu(ConvBN(32, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_5")(xx, train))
        xx = nn.relu(DeconvBN(32, 3, stride=2, axis_name=ax,
                              name="deconv_ba2")(xx, train))
        xl1 = resize_bilinear(xleft1, (xx.shape[1], xx.shape[2]))
        xx = jnp.concatenate([xx, xl1], axis=-1)
        xx = nn.relu(ConvBN(32, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_6")(xx, train))
        s2 = Conv2DownUp(32, 5, last_layer=False, axis_name=ax,
                         name="cdu7")(xx, train)
        s2 = ConvOut(self.labels, 5, name="branchConv")(s2)
        s2 = jax.nn.log_softmax(s2, axis=-1)
        s2 = resize_bilinear(s2, full_hw)
        seg2 = 0.9 * s2 + 0.1 * seg1  # raw-logit mix quirk (:562)

        # refined disp head (:564-585)
        y4 = jnp.concatenate([a_py0, b_py0], axis=-1)
        y4 = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_9")(y4, train))
        yy = upsample_nearest(y, 4)
        yy = resize_bilinear(yy, (y4.shape[1], y4.shape[2]))
        yy = jnp.concatenate([y4, yy], axis=-1)
        y5 = Conv2DownUp(64, 3, axis_name=ax, name="cdu8")(x3, train)
        yy = resize_bilinear(yy, (y5.shape[1], y5.shape[2]))
        yy = jnp.concatenate([y5, yy], axis=-1)
        yy = Conv2DownUp(64, 3, axis_name=ax, name="cdu9")(yy, train)
        yy = upsample_nearest(yy, 2)
        xl3 = resize_bilinear(xleft3, (yy.shape[1], yy.shape[2]))
        d2 = jnp.concatenate([yy, xl3], axis=-1)
        d2 = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_8")(d2, train))
        d2 = Conv2DownUp(64, 5, last_layer=False, axis_name=ax,
                         name="cdu10")(d2, train)
        d2 = ConvOut(1, 5, name="cdu10_out")(d2)
        d2 = resize_bilinear(d2, full_hw)
        disp2 = 0.8 * d2 + 0.2 * disp1

        return {"seg1": seg1, "disp1": disp1, "seg2": seg2, "disp2": disp2}


@MODELS.register("sdnet")
def _mk_dsnet(cfg, labels, axis_name=None):
    return DSNet(cfg=cfg, labels=labels, axis_name=axis_name)


@MODELS.register("sdnetv2")
def _mk_dsnetv2(cfg, labels, axis_name=None):
    return DSNetV2(cfg=cfg, labels=labels, axis_name=axis_name)
