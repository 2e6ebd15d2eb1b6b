"""Torch EfficientNet oracle, state-dict compatible with efficientnet_pytorch.

The reference depends on the external `efficientnet_pytorch` package
(models/dsnet_t2.py:9, `EfficientNet.from_pretrained` at :1956/:1966/:1974)
which is not installed in this image. This is an independent torch
implementation of that package's architecture, used to transport-prove our
flax EfficientNetFeatures:

* state-dict keys match lukemelas's layout exactly (`_conv_stem`, `_bn0`,
  `_blocks.{i}._expand_conv/_bn0/_depthwise_conv/_bn1/_se_reduce/_se_expand/
  _project_conv/_bn2`, `_conv_head`, `_bn1`) so torch-checkpoint import of a
  real reference checkpoint exercises the same code path;
* convs use TF-style dynamic 'SAME' padding (Conv2dDynamicSamePadding);
* BN momentum 0.01 / eps 1e-3, swish activations, SE over
  int(0.25*input_filters) channels;
* `extract_endpoints` follows the 0.6.x semantics the reference ran
  (reduction_5 = the 1x1 head output; the printed channel comments at
  dsnet_t2.py:1958-1980 — b2 (16,24,48,120,1408) — pin that version, the
  0.7.x variant would make reduction_5 the 352-ch last block instead).
"""
import math
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F

# (expand, channels, repeats, stride, kernel) — the B0 stage table
_B0_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

_SCALES = {
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
    "efficientnet-b5": (1.6, 2.2),
}


def round_filters(f, width, divisor=8):
    f *= width
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


def round_repeats(r, depth):
    return int(math.ceil(depth * r))


class Conv2dDynamicSamePadding(nn.Conv2d):
    """TF 'SAME' padding computed per-forward (utils.py of the package)."""

    def __init__(self, in_ch, out_ch, kernel, stride=1, groups=1, bias=True):
        super().__init__(in_ch, out_ch, kernel, stride, 0, 1, groups, bias)

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        if ph > 0 or pw > 0:
            x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _swish(x):
    return x * torch.sigmoid(x)


class MBConvBlock(nn.Module):
    def __init__(self, cin, cout, expand, kernel, stride):
        super().__init__()
        self.cin, self.cout, self.stride = cin, cout, stride
        self.expand = expand
        mid = cin * expand
        if expand != 1:
            self._expand_conv = Conv2dDynamicSamePadding(cin, mid, 1,
                                                         bias=False)
            self._bn0 = nn.BatchNorm2d(mid, momentum=0.01, eps=1e-3)
        self._depthwise_conv = Conv2dDynamicSamePadding(
            mid, mid, kernel, stride, groups=mid, bias=False)
        self._bn1 = nn.BatchNorm2d(mid, momentum=0.01, eps=1e-3)
        se = max(1, int(cin * 0.25))
        self._se_reduce = Conv2dDynamicSamePadding(mid, se, 1)
        self._se_expand = Conv2dDynamicSamePadding(se, mid, 1)
        self._project_conv = Conv2dDynamicSamePadding(mid, cout, 1,
                                                      bias=False)
        self._bn2 = nn.BatchNorm2d(cout, momentum=0.01, eps=1e-3)

    def forward(self, inputs):
        x = inputs
        if self.expand != 1:
            x = _swish(self._bn0(self._expand_conv(x)))
        x = _swish(self._bn1(self._depthwise_conv(x)))
        s = F.adaptive_avg_pool2d(x, 1)
        s = self._se_expand(_swish(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.cin == self.cout:
            x = x + inputs  # drop_connect is identity in eval
        return x


class EfficientNet(nn.Module):
    def __init__(self, width, depth):
        super().__init__()
        stem = round_filters(32, width)
        self._conv_stem = Conv2dDynamicSamePadding(3, stem, 3, 2, bias=False)
        self._bn0 = nn.BatchNorm2d(stem, momentum=0.01, eps=1e-3)
        blocks = []
        cin = stem
        for e, c, n, s, k in _B0_STAGES:
            cout = round_filters(c, width)
            for r in range(round_repeats(n, depth)):
                blocks.append(MBConvBlock(cin, cout, e, k,
                                          s if r == 0 else 1))
                cin = cout
        self._blocks = nn.ModuleList(blocks)
        head = round_filters(1280, width)
        self._conv_head = Conv2dDynamicSamePadding(cin, head, 1, bias=False)
        self._bn1 = nn.BatchNorm2d(head, momentum=0.01, eps=1e-3)

    def extract_endpoints(self, inputs):
        endpoints = OrderedDict()
        x = _swish(self._bn0(self._conv_stem(inputs)))
        prev = x
        for block in self._blocks:
            x = block(x)
            if prev.size(2) > x.size(2):
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            prev = x
        x = _swish(self._bn1(self._conv_head(x)))
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        return endpoints

    def forward(self, x):
        return self.extract_endpoints(x)[f"reduction_5"]

    @classmethod
    def from_name(cls, name):
        w, d = _SCALES[name]
        return cls(w, d)

    @classmethod
    def from_pretrained(cls, name):
        # no network access here — random init stands in for the download
        return cls.from_name(name)
