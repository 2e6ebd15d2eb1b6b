"""The Ext_small family — RCU-based compact joint nets.

Reference: models/dsnet_t2_ext_small.py (RCU :43-64, Ext_small :130-381,
Ext_smallv2 :382-638, Ext_smallv0 :639-894, file-local segNet :1072-1096).

Shared skeleton (differs from minidsnetExt): RCU residual conv units
instead of Conv2DownUp hourglasses — including inside the seg head, which
is the file-local RCU ``segNet`` (:1072-1096), NOT dsnet_t2's
Conv2DownUp segNet — a single self-attention gate from s2 (sigmoid 1x1,
blended as cat(s2_d*at, s2_s*(1-at)), :370/:621/:876), conv output heads,
and backbone-tap skips:

* Ext_smallv0 ('sdnet_mini_ext_small'): RCUs with use_deconv=True,
  segNet(fc=64, labels), skips from a_0 / a_pyramidB_0;
  forward(left, right) (:778).
* Ext_small ('sdnet_mini_ext_small_edge', outputType edgeOut): ALL RCUs
  use_deconv=False incl. segNet (:245), segNet labels=1 — head 1 IS the
  edge logit map (edge_ds in netForward, torch_implementation.py:170-171);
  skips come from 5x5 dilated convs over the grad-mag edge map (:283-289).
* Ext_smallv2 ('..._edgev2'): v0 wiring (use_deconv=True, a_0/a_pyramidB_0
  skips — the edge-conv skips are commented out, :543-545) but segNet
  labels=1 like the edge variant (:506).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.registry import MODELS
from ..ops.correlation import correlation
from ..ops.resize import resize_bilinear, resize_nearest, upsample_nearest
from .blocks import ConvBN, DeconvBN
from .pyramid import PiramidNet2


class RCU(nn.Module):
    """Residual conv unit (dsnet_t2_ext_small.py:43-64): c1 -> c2 ->
    (d3 deconv | c3 conv) with the residual added from c1's output."""

    features: int
    kernel: int = 3
    use_deconv: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(features=self.features, kernel=self.kernel, relu=True,
                  axis_name=self.axis_name)
        x = ConvBN(name="c1", **kw)(x, train)
        x1 = ConvBN(name="c2", **kw)(x, train)
        if self.use_deconv:
            x1 = DeconvBN(name="d3", **kw)(x1, train)
        else:
            # the reference follows c3 with a same-size bilinear interpolate
            # (:63) — identity at scale 1
            x1 = ConvBN(name="c3", **kw)(x1, train)
        return x1 + x


class ExtSmallSegNet(nn.Module):
    """File-local segNet (dsnet_t2_ext_small.py:1072-1096): RCU-based,
    conv2dSame output head (not the ConvTranspose2dSame of dsnet_t2's
    segNet). Returns (x @ deepest/2, x1 @ deepest/4, seg @ full res)."""

    labels: int
    rcu_deconv: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, full_hw: Tuple[int, int], xleft,
                 train: bool = False):
        ax = self.axis_name
        x = upsample_nearest(x, 2)
        x = nn.relu(
            ConvBN(64, 1, batchnorm=False, axis_name=ax,
                   name="conv1d_1")(x, train)
        )
        x = RCU(32, 3, use_deconv=self.rcu_deconv, axis_name=ax,
                name="cdu1")(x, train)
        x1 = upsample_nearest(x, 2)
        x1_1 = resize_nearest(x, (xleft.shape[1], xleft.shape[2]))
        x1_1 = jnp.concatenate([x1_1, xleft], axis=-1)
        x1_1 = nn.relu(
            ConvBN(32, 1, batchnorm=False, axis_name=ax,
                   name="conv1d_2")(x1_1, train)
        )
        seg = RCU(32, 3, use_deconv=self.rcu_deconv, axis_name=ax,
                  name="cdu2")(x1_1, train)
        seg = nn.Conv(self.labels, (3, 3), padding="SAME", use_bias=False,
                      name="out")(seg)
        seg = resize_nearest(seg, full_hw)
        return x, x1, seg


class ExtSmall(nn.Module):
    """All three ext_small variants, switched by ``variant``."""

    cfg: ModelConfig
    labels: int = 2
    variant: str = "v0"  # v0 | edge | v2
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_a, input_b, train: bool = False,
                 left_e: Optional[jnp.ndarray] = None, **_):
        m = self.cfg
        ax = self.axis_name
        aspp_mod = m.aspp
        patch = (1, 17) if m.corr_type == "1dcorr" else (17, 17)
        # Ext_small/v0/v2 all use use_deconv=False ONLY in the edge variant
        # (:245-257 vs :506-518, :745-757)
        use_dc = self.variant != "edge"
        left = input_a[..., :3] if m.edges else input_a
        right = input_b[..., :3] if m.edges else input_b
        full_hw = (left.shape[1], left.shape[2])

        pyr = PiramidNet2(backbone=m.backbone, axis_name=ax, name="features")
        a0, a1, a2, a3, a4, a_py2, a_py1, a_py0 = pyr(left, train)
        b0, b1, b2, b3, b4, b_py2, b_py1, b_py0 = pyr(right, train)

        if self.variant == "edge":
            assert left_e is not None, "edge variant needs the edge map input"
            h2 = (left_e.shape[1] // 2, left_e.shape[2] // 2)
            edge_1 = resize_bilinear(left_e, h2)
            edge_2 = resize_bilinear(left_e, h2)
            xleft0 = nn.relu(ConvBN(1, 5, dilation=2, axis_name=ax,
                                    name="conv2d_ba0")(edge_1, train))
            xleft1 = nn.relu(ConvBN(1, 5, dilation=2, axis_name=ax,
                                    name="conv2d_ba2")(left_e, train))
            xleft2 = nn.relu(ConvBN(1, 5, dilation=2, axis_name=ax,
                                    name="conv2d_ba1")(edge_2, train))
            seg_skip = xleft0
            disp_skip = xleft2
            final_skip = xleft1
        else:
            seg_skip = a0
            disp_skip = a0
            final_skip = a_py0

        if m.backbone in ("resnet50", "resnet101"):
            from .aspp import ASPP

            aspp4 = ASPP(output_stride=16, axis_name=ax, name="aspp_4")
            a4 = aspp4(a4, train)
            b4 = aspp4(b4, train)

        # edge and v2 build the seg head with labels=1 — head 1 is the edge
        # logit map the driver consumes as edge_ds (:245 `segNet(..., 1, 1,
        # RCU_deconv=False)`, :506 `segNet(..., 64, 1)`)
        head1_ch = self.labels if self.variant == "v0" else 1
        x = jnp.concatenate([a4, b4], axis=-1)
        x, x1, seg_branch = ExtSmallSegNet(
            head1_ch, rcu_deconv=use_dc, axis_name=ax, name="segNet"
        )(x, full_hw, seg_skip, train)

        y = correlation(a_py2, b_py2, patch,
                        normalize=(m.corr_type != "1dcorr"))
        y = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                           name="corrConv2d")(y, train))
        y1 = RCU(64, 3, use_deconv=use_dc, axis_name=ax, name="rcu3")(x1, train)
        y1 = resize_bilinear(y1, (y.shape[1], y.shape[2]))
        y = jnp.concatenate([y1, y], axis=-1)
        y = RCU(64, 3, use_deconv=use_dc, axis_name=ax, name="rcu4")(y, train)

        y2 = upsample_nearest(y, 8)
        dskip = resize_bilinear(disp_skip, (y2.shape[1], y2.shape[2]))
        disp = jnp.concatenate([y2, dskip], axis=-1)
        disp = nn.relu(ConvBN(64, 1, batchnorm=False, axis_name=ax,
                              name="conv1d_2")(disp, train))
        disp = RCU(64, 5, use_deconv=use_dc, axis_name=ax,
                   name="rcu5")(disp, train)
        disp = nn.Conv(1, (5, 5), padding="SAME", use_bias=False,
                       name="dispoutConv")(disp)
        disp_out = resize_bilinear(disp, full_hw)

        if aspp_mod == 1:
            from .aspp import ASPP

            s2 = ASPP(output_stride=32, axis_name=ax, name="aspp")(a1, train)
        elif aspp_mod == 2:
            from .aspp import ASPP

            aspp = ASPP(output_stride=32, axis_name=ax, name="aspp")
            s2_1 = aspp(a3, train)
            s2_2 = aspp(b3, train)
            s2_corr = correlation(s2_1, s2_2, (1, 17))
            s2 = jnp.concatenate([s2_corr, s2_1], axis=-1)
        else:
            s2 = b_py1  # right pyramid only (:856)

        s2 = nn.relu(ConvBN(128, 1, batchnorm=False, axis_name=ax,
                            name="conv1d_4")(s2, train))
        s2 = RCU(64, 3, use_deconv=use_dc, axis_name=ax, name="rcu6")(s2, train)

        y3 = resize_nearest(y, (s2.shape[1], s2.shape[2]))
        s2_d = RCU(64, 3, use_deconv=use_dc, axis_name=ax, name="rcu7")(
            jnp.concatenate([s2, y3], axis=-1), train
        )
        x3 = RCU(64, 3, use_deconv=use_dc, axis_name=ax, name="rcu8")(x1, train)
        x3 = resize_nearest(x3, (s2.shape[1], s2.shape[2]))
        s2_s = RCU(64, 3, use_deconv=use_dc, axis_name=ax, name="rcu9")(
            jnp.concatenate([s2, x3], axis=-1), train
        )
        s2_at = nn.sigmoid(ConvBN(1, 1, batchnorm=False, axis_name=ax,
                                  name="conv1d_at")(s2, train))
        s2 = jnp.concatenate([s2_d * s2_at, s2_s * (1.0 - s2_at)], axis=-1)
        s2 = RCU(64, 3, use_deconv=use_dc, axis_name=ax,
                 name="rcu10")(s2, train)

        if aspp_mod == 2:
            cat_skip = a0
        else:
            cat_skip = final_skip
        s2 = resize_nearest(s2, (cat_skip.shape[1], cat_skip.shape[2]))
        s2 = jnp.concatenate([s2, cat_skip], axis=-1)
        sb2 = nn.relu(ConvBN(32, 1, batchnorm=False, axis_name=ax,
                             name="conv1d_5")(s2, train))
        sb2 = RCU(32, 3, use_deconv=use_dc, axis_name=ax,
                  name="rcu11")(sb2, train)
        sb2 = nn.Conv(self.labels, (3, 3), padding="SAME", use_bias=False,
                      name="rcu11_out")(sb2)
        seg_branch2 = resize_nearest(sb2, full_hw)

        out = {"seg1": seg_branch, "disp1": disp_out,
               "seg2": seg_branch2, "disp2": disp_out}
        if self.variant != "v0":
            # driver mapping for edgeOut: head1 doubles as the edge logits
            # (torch_implementation.py:170-171); seg metrics run on head 2
            out["edge"] = seg_branch
            out["seg1"] = seg_branch2
        return out


@MODELS.register("sdnet_mini_ext_small")
def _mk_v0(cfg, labels, axis_name=None):
    return ExtSmall(cfg=cfg, labels=labels, variant="v0", axis_name=axis_name)


@MODELS.register("sdnet_mini_ext_small_edge")
def _mk_edge(cfg, labels, axis_name=None):
    return ExtSmall(cfg=cfg, labels=labels, variant="edge", axis_name=axis_name)


@MODELS.register("sdnet_mini_ext_small_edgev2")
def _mk_v2(cfg, labels, axis_name=None):
    return ExtSmall(cfg=cfg, labels=labels, variant="v2", axis_name=axis_name)
