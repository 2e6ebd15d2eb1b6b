"""PSMNet (stacked hourglass) — TPU-native flax re-design.

Reference: models_psmnet/ (stackhourglass.py, submodule.py,
process_input.py). Key translations:

* the python shift-loop cost volume (stackhourglass.py:110-119) becomes a
  vectorized masked shift-concat producing an NDHWC volume
  (B, D, H, W, 2C) — ``ops.costvolume.concat_cost_volume`` — that XLA fuses;
* 3-D convs run in NDHWC (flax nn.Conv with 3-D kernels);
* ConvTranspose3d(stride 2, output_padding 1) -> nn.ConvTranspose SAME
  (identical output arithmetic, 2x upsample);
* trilinear upsample + softmax + soft-argmin disparity regression
  (submodule.py:56-64) stay fused under jit;
* input pad-to-/16 handling follows process_input.py:4-31.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import MODELS
from ..ops.costvolume import concat_cost_volume, soft_argmin
from ..ops.resize import avg_pool, resize_bilinear
from .blocks import bn_train_mode, he_fan_out


def _bn(mod, train, axis_name, name):
    return nn.BatchNorm(
        use_running_average=not bn_train_mode(mod, train), momentum=0.9, epsilon=1e-5,
        axis_name=axis_name, dtype=None, name=name,
    )


class _ConvBN2d(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.dilation if self.dilation > 1 else (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(pad, pad), (pad, pad)], use_bias=False,
            kernel_init=he_fan_out, name="conv",
        )(x)
        return _bn(self, train, self.axis_name, "bn")(x)


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        out = nn.relu(
            _ConvBN2d(self.planes, 3, self.stride, self.dilation,
                      self.axis_name, name="c1")(x, train)
        )
        out = _ConvBN2d(self.planes, 3, 1, self.dilation,
                        self.axis_name, name="c2")(out, train)
        if self.downsample:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="down")(x)
            x = _bn(self, train, self.axis_name, "down_bn")(x)
        return out + x


class PSMFeature(nn.Module):
    """feature_extraction (submodule.py:66-141): CNN to 1/4 + SPP."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        ax = self.axis_name
        for i, (stride,) in enumerate([(2,), (1,), (1,)]):
            x = nn.relu(
                _ConvBN2d(32, 3, stride[0] if isinstance(stride, tuple) else stride,
                          1, ax, name=f"first{i}")(x, train)
            )
        # layer1: 3x BasicBlock(32, s1); layer2: 16x (64, s2);
        # layer3: 3x (128, s1); layer4: 3x (128, s1, dil2)
        for i in range(3):
            x = _BasicBlock(32, 1, 1, False, ax, name=f"l1_{i}")(x, train)
        for i in range(16):
            x = _BasicBlock(64, 2 if i == 0 else 1, 1, i == 0, ax,
                            name=f"l2_{i}")(x, train)
        raw = x
        for i in range(3):
            x = _BasicBlock(128, 1, 1, i == 0, ax, name=f"l3_{i}")(x, train)
        # layer4: inplanes == planes and stride 1, so _make_layer creates NO
        # downsample (submodule.py:105-108) — unlike layer3
        for i in range(3):
            x = _BasicBlock(128, 1, 2, False, ax, name=f"l4_{i}")(x, train)
        skip = x

        h, w = skip.shape[1], skip.shape[2]
        branches = [raw, skip]
        for i, pool in enumerate((64, 32, 16, 8)):
            p = min(pool, h, w)
            b = avg_pool(skip, p, p)
            b = nn.relu(
                _ConvBN2d(32, 1, 1, 1, ax, name=f"branch{i + 1}")(b, train)
            )
            branches.append(resize_bilinear(b, (h, w)))
        # reference concat order: raw, skip, b4, b3, b2, b1
        feat = jnp.concatenate(
            [branches[0], branches[1], branches[5], branches[4],
             branches[3], branches[2]], axis=-1,
        )
        feat = nn.relu(_ConvBN2d(128, 3, 1, 1, ax, name="last0")(feat, train))
        return nn.Conv(32, (1, 1), use_bias=False, kernel_init=he_fan_out,
                       name="last1")(feat)


class _ConvBN3d(nn.Module):
    features: int
    stride: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.features, (3, 3, 3), strides=(self.stride,) * 3,
            padding=[(1, 1)] * 3, use_bias=False, kernel_init=he_fan_out,
            name="conv",
        )(x)
        return _bn(self, train, self.axis_name, "bn")(x)


class _Deconv3dBN(nn.Module):
    """ConvTranspose3d(k3, s2, pad 1, output_padding 1) + BN. The explicit
    (1, 2) padding (not 'SAME') reproduces torch's output arithmetic exactly
    (verified to 1e-15 in fp64); the kernel imports with flipped spatial dims
    (utils/torch_import_families.py)."""

    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.ConvTranspose(
            self.features, (3, 3, 3), strides=(2, 2, 2),
            padding=((1, 2), (1, 2), (1, 2)),
            use_bias=False, kernel_init=he_fan_out, name="deconv",
        )(x)
        return _bn(self, train, self.axis_name, "bn")(x)


class Hourglass3D(nn.Module):
    """hourglass (stackhourglass.py:10-50), NDHWC."""

    inplanes: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, presqu, postsqu, train=False):
        ax = self.axis_name
        out = nn.relu(_ConvBN3d(self.inplanes * 2, 2, ax, name="c1")(x, train))
        pre = _ConvBN3d(self.inplanes * 2, 1, ax, name="c2")(out, train)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)
        out = nn.relu(_ConvBN3d(self.inplanes * 2, 2, ax, name="c3")(pre, train))
        out = nn.relu(_ConvBN3d(self.inplanes * 2, 1, ax, name="c4")(out, train))
        post = _Deconv3dBN(self.inplanes * 2, ax, name="c5")(out, train)
        post = nn.relu(post + (presqu if presqu is not None else pre))
        out = _Deconv3dBN(self.inplanes, ax, name="c6")(post, train)
        return out, pre, post


def pad_to_multiple_of_16(left, right):
    """process_input.py:4-31 — pad H,W up to /16, return unpad slices."""
    h, w = left.shape[1], left.shape[2]
    ph = (16 - h % 16) % 16
    pw = (16 - w % 16) % 16
    if ph or pw:
        pad = ((0, 0), (ph, 0), (pw, 0), (0, 0))  # reference pads at the top
        left = jnp.pad(left, pad)
        right = jnp.pad(right, pad)
    return left, right, (ph, pw)


class PSMNet(nn.Module):
    """stackhourglass.PSMNet (disp-only; seg faked by the driver,
    torch_implementation.py:167-169)."""

    maxdisp: int = 192
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, left, right, train: bool = False, **_):
        ax = self.axis_name
        lp, rp, (ph, pw) = pad_to_multiple_of_16(left, right)
        feat = PSMFeature(axis_name=ax, name="feature")
        ref = feat(lp, train)
        tgt = feat(rp, train)

        d4 = self.maxdisp // 4
        cost = concat_cost_volume(ref, tgt, d4)  # (B, D/4, H/4, W/4, 2C)

        c = nn.relu(_ConvBN3d(32, 1, ax, name="dres0a")(cost, train))
        c = nn.relu(_ConvBN3d(32, 1, ax, name="dres0b")(c, train))
        r = nn.relu(_ConvBN3d(32, 1, ax, name="dres1a")(c, train))
        r = _ConvBN3d(32, 1, ax, name="dres1b")(r, train)
        cost0 = r + c

        hg1 = Hourglass3D(32, ax, name="dres2")
        hg2 = Hourglass3D(32, ax, name="dres3")
        hg3 = Hourglass3D(32, ax, name="dres4")
        out1, pre1, post1 = hg1(cost0, None, None, train)
        out1 = out1 + cost0
        out2, pre2, post2 = hg2(out1, pre1, post1, train)
        out2 = out2 + cost0
        out3, pre3, post3 = hg3(out2, pre1, post2, train)
        out3 = out3 + cost0

        def classif(x, name):
            y = nn.relu(_ConvBN3d(32, 1, ax, name=f"{name}a")(x, train))
            return nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                           kernel_init=he_fan_out, name=f"{name}b")(y)

        cost1 = classif(out1, "classif1")
        cost2 = classif(out2, "classif2") + cost1
        cost3 = classif(out3, "classif3") + cost2

        hp, wp = lp.shape[1], lp.shape[2]

        from ..ops.costvolume import upsampled_soft_argmin

        def regress(cvol):
            # fused trilinear upsample + softmax + soft-argmin
            # (submodule.py:56-64) — never materializes the full-res volume
            v = cvol[..., 0]  # (B, D, H, W)
            chunk = 32 if hp % 32 == 0 else (16 if hp % 16 == 0 else hp)
            d = upsampled_soft_argmin(v, self.maxdisp, (hp, wp), chunk=chunk)
            return d[:, ph:, pw:][..., None]  # unpad, NHWC 1ch

        pred3 = regress(cost3)
        if train:
            pred1 = regress(cost1)
            pred2 = regress(cost2)
            return {"seg1": None, "disp1": pred3, "seg2": None,
                    "disp2": pred3, "preds": (pred1, pred2, pred3)}
        return {"seg1": None, "disp1": pred3, "seg2": None, "disp2": pred3}


@MODELS.register("pspnet")
def _make_psmnet(cfg, labels: int, axis_name=None):
    return PSMNet(maxdisp=cfg.max_disp_psm, axis_name=axis_name)
