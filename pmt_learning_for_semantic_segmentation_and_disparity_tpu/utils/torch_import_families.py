"""Per-family torch -> flax weight transport (VERDICT round-2 #1).

Importers for the model families beyond the flagship: the DeepLabV3+
pair (models_deeplab/net.py:82-135, models_deeplab_mod/net.py:82-169),
PSMNet (models_psmnet/stackhourglass.py), the ext_small RCU family
(models/dsnet_t2_ext_small.py) and the warp family
(models/dsnet_t2_warp.py:577-703). Each converts a torch state dict
(random-init or trained) into {params, batch_stats} trees structurally
identical to a fresh flax init of our corresponding model, proving the
wiring at activation level via tests/test_parity_families.py.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .torch_import import (
    _cdu,
    _conv_plain,
    _convbn,
    _deconv_out,
    _deconvbn,
    bn_entries,
    conv_kernel,
    deconv_as_conv_kernel,
    depthwise_kernel,
    import_piramidnet2,
)

Tree = Dict[str, Any]


def _get(sd: Mapping[str, np.ndarray], key: str) -> np.ndarray:
    return np.asarray(sd[key])


# ---------------------------------------------------------------------------
# DeepLabV3+ family (models_deeplab / models_deeplab_mod)
# ---------------------------------------------------------------------------

def _separable(sd, prefix) -> Tuple[Tree, Tree]:
    """SeparableConv2d (models_deeplab/common.py:25-52) -> SeparableConv."""
    p: Tree = {
        "depthwise": {"kernel": depthwise_kernel(
            _get(sd, f"{prefix}.block.depthwise.weight"))},
        "pointwise": {"kernel": conv_kernel(
            _get(sd, f"{prefix}.block.pointwise.weight"))},
    }
    s: Tree = {}
    for name in ("bn_depth", "bn_point"):
        bp, bs = bn_entries(sd, f"{prefix}.block.{name}")
        p[name], s[name] = bp, bs
    return p, s


def _plain_bn(sd, prefix) -> Tuple[Tree, Tree]:
    return bn_entries(sd, prefix)


def _conv_nobias(sd, key) -> Tree:
    return {"kernel": conv_kernel(_get(sd, key))}


def _conv_bias(sd, prefix) -> Tree:
    return {"kernel": conv_kernel(_get(sd, f"{prefix}.weight")),
            "bias": _get(sd, f"{prefix}.bias")}


def import_xception65(sd, prefix="encoder") -> Tuple[Tree, Tree]:
    """Xception65 (models_deeplab/xception.py:49-135; the _mod variant has
    identical parameters — the block8/14 taps are forward-only)."""
    p: Tree = {}
    s: Tree = {}
    p["conv1"] = _conv_nobias(sd, f"{prefix}.conv1.weight")
    p["bn1"], s["bn1"] = _plain_bn(sd, f"{prefix}.bn1")
    p["conv2"] = _conv_nobias(sd, f"{prefix}.conv2.weight")
    p["bn2"], s["bn2"] = _plain_bn(sd, f"{prefix}.bn2")
    for i in range(1, 22):
        bp: Tree = {}
        bs: Tree = {}
        for k in (1, 2, 3):
            sp, ss = _separable(sd, f"{prefix}.block{i}.sep_conv{k}")
            bp[f"sep{k}"], bs[f"sep{k}"] = sp, ss
        if f"{prefix}.block{i}.conv.weight" in sd:  # skip='conv' blocks
            bp["skip_conv"] = _conv_nobias(sd, f"{prefix}.block{i}.conv.weight")
            bp["skip_bn"], bs["skip_bn"] = _plain_bn(sd, f"{prefix}.block{i}.bn")
        p[f"block{i}"], s[f"block{i}"] = bp, bs
    return p, s


def import_aspp_deeplab(sd, prefix="spp") -> Tuple[Tree, Tree]:
    """ASPP (models_deeplab/spp.py:34-77) -> ASPPDeeplab."""
    p: Tree = {}
    s: Tree = {}
    p["gap_conv"] = _conv_nobias(sd, f"{prefix}.image_pooling.conv.weight")
    p["gap_bn"], s["gap_bn"] = _plain_bn(sd, f"{prefix}.image_pooling.bn")
    p["aspp0_conv"] = _conv_nobias(sd, f"{prefix}.aspp0.conv.weight")
    p["aspp0_bn"], s["aspp0_bn"] = _plain_bn(sd, f"{prefix}.aspp0.bn")
    for i in (1, 2, 3):
        sp, ss = _separable(sd, f"{prefix}.aspp{i}")
        p[f"aspp{i}"], s[f"aspp{i}"] = sp, ss
    p["proj"] = _conv_nobias(sd, f"{prefix}.conv.weight")
    p["proj_bn"], s["proj_bn"] = _plain_bn(sd, f"{prefix}.bn")
    return p, s


def import_mobilenetv2_encoder(sd, prefix="encoder") -> Tuple[Tree, Tree]:
    """MobileNetV2 deeplab encoder (models_deeplab/mobilenet.py:53-103:
    stem conv + 17 ExpandedConv blocks, output_stride 8 via dilation) ->
    MobileNetV2Encoder params/batch_stats."""
    p: Tree = {}
    s: Tree = {}
    p["stem"] = _conv_nobias(sd, f"{prefix}.conv.weight")
    p["stem_bn"], s["stem_bn"] = _plain_bn(sd, f"{prefix}.bn")
    for i in range(17):
        pre = f"{prefix}.block{i}"
        if f"{pre}.expand.conv.weight" in sd:  # block0 has expand_ratio=1
            p[f"block{i}_expand"] = _conv_nobias(sd, f"{pre}.expand.conv.weight")
            p[f"block{i}_ebn"], s[f"block{i}_ebn"] = _plain_bn(
                sd, f"{pre}.expand.bn")
        p[f"block{i}_dw"] = _conv_nobias(sd, f"{pre}.depthwise.conv.weight")
        p[f"block{i}_dbn"], s[f"block{i}_dbn"] = _plain_bn(
            sd, f"{pre}.depthwise.bn")
        p[f"block{i}_proj"] = _conv_nobias(sd, f"{pre}.project.conv.weight")
        p[f"block{i}_pbn"], s[f"block{i}_pbn"] = _plain_bn(
            sd, f"{pre}.project.bn")
    return p, s


def import_mobile_aspp(sd, prefix="spp") -> Tuple[Tree, Tree]:
    """MobileASPP (models_deeplab/spp.py:80-108) -> MobileASPP."""
    p: Tree = {}
    s: Tree = {}
    p["gap_conv"] = _conv_nobias(sd, f"{prefix}.image_pooling.conv.weight")
    p["gap_bn"], s["gap_bn"] = _plain_bn(sd, f"{prefix}.image_pooling.bn")
    p["aspp0_conv"] = _conv_nobias(sd, f"{prefix}.aspp0.conv.weight")
    p["aspp0_bn"], s["aspp0_bn"] = _plain_bn(sd, f"{prefix}.aspp0.bn")
    p["proj"] = _conv_nobias(sd, f"{prefix}.conv.weight")
    p["proj_bn"], s["proj_bn"] = _plain_bn(sd, f"{prefix}.bn")
    return p, s


def import_spp_decoder(sd, prefix, concat_prev=False) -> Tuple[Tree, Tree]:
    """SPPDecoder (models_deeplab_mod/spp.py:131-157 superset)."""
    p: Tree = {}
    s: Tree = {}
    p["low_conv"] = _conv_nobias(sd, f"{prefix}.conv.weight")
    p["low_bn"], s["low_bn"] = _plain_bn(sd, f"{prefix}.bn")
    if concat_prev:
        p["int_conv"] = _conv_nobias(sd, f"{prefix}.conv_int_feat.weight")
    for k in ("sep1", "sep2"):
        sp, ss = _separable(sd, f"{prefix}.{k}")
        p[k], s[k] = sp, ss
    return p, s


def import_sppnet_mono(state_dict, enc_type="xception65",
                       dec_type="aspp") -> Tuple[Tree, Tree]:
    """SPPNet 'deeplab' (models_deeplab/net.py:82-135) -> SPPNetMono
    {params, batch_stats}. enc_type 'xception65' (aspp + decoder) or
    'mobilenetv2' (create_mspp decoder-less head, net.py:93-104 — dec_type
    'aspp' = full ASPP(320,256,8), 'maspp' = MobileASPP)."""
    sd = state_dict
    p: Tree = {}
    s: Tree = {}
    if enc_type == "mobilenetv2":
        p["encoder"], s["encoder"] = import_mobilenetv2_encoder(sd)
        if dec_type == "maspp":
            p["spp"], s["spp"] = import_mobile_aspp(sd)
        else:
            p["spp"], s["spp"] = import_aspp_deeplab(sd)
    else:
        p["encoder"], s["encoder"] = import_xception65(sd)
        p["spp"], s["spp"] = import_aspp_deeplab(sd)
        p["decoder"], s["decoder"] = import_spp_decoder(sd, "decoder")
    p["logits"] = _conv_bias(sd, "logits")
    return p, s


def import_sppnet_stereo(state_dict) -> Tuple[Tree, Tree]:
    """SPPNet 'deeplab_mod' (models_deeplab_mod/net.py:82-169) ->
    SPPNetStereo: shared-weight stereo encoder, 1-D correlation on the
    block-8 mid features, three chained SPPDecoders."""
    sd = state_dict
    p: Tree = {}
    s: Tree = {}
    p["encoder"], s["encoder"] = import_xception65(sd)
    p["spp"], s["spp"] = import_aspp_deeplab(sd)
    p["decoder"], s["decoder"] = import_spp_decoder(sd, "decoder")
    p["decoder2"], s["decoder2"] = import_spp_decoder(
        sd, "decoder2", concat_prev=True)
    p["decoder3"], s["decoder3"] = import_spp_decoder(
        sd, "decoder3", concat_prev=True)
    p["conv2"] = _conv_nobias(sd, "conv2.weight")
    p["conv3"] = _conv_nobias(sd, "conv3.weight")
    p["corrConv"] = _conv_nobias(sd, "corrConv2d.0.weight")
    p["logits"] = _conv_bias(sd, "logits")
    p["logits_disp"] = _conv_bias(sd, "logits_disp")
    p["logits_seg"] = _conv_bias(sd, "logits_seg")
    return p, s


def import_xception65_backbone(state_dict) -> Tuple[Tree, Tree]:
    """Standalone pretrained Xception65 checkpoint (unprefixed keys, the
    layout models_deeplab/xception.py's load_url delivers) -> our deeplab
    encoder subtree. The reference defaults pretrained=True for the mono
    deeplab net (models_deeplab/net.py:26); -pretrained_path is our
    zero-egress equivalent."""
    return import_xception65({f"encoder.{k}": v
                              for k, v in state_dict.items()})


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear (O,I) -> flax Dense (I,O)."""
    return np.transpose(w, (1, 0))


# (k, t, c, SE, HS, s) — models/mobilenetv3.py:201-218
_MBV3_LARGE_CFG = [
    (3, 1, 16, 0, 0, 1), (3, 4, 24, 0, 0, 2), (3, 3, 24, 0, 0, 1),
    (5, 3, 40, 1, 0, 2), (5, 3, 40, 1, 0, 1), (5, 3, 40, 1, 0, 1),
    (3, 6, 80, 0, 1, 2), (3, 2.5, 80, 0, 1, 1), (3, 2.3, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1), (3, 6, 112, 1, 1, 1), (3, 6, 112, 1, 1, 1),
    (5, 6, 160, 1, 1, 2), (5, 6, 160, 1, 1, 1), (5, 6, 160, 1, 1, 1),
]


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def import_mobilenetv3_backbone(state_dict) -> Tuple[Tree, Tree]:
    """MobileNetV3-Large checkpoint (cuevhv mobilenetv3.pytorch layout:
    features.0 stem, features.1..15 InvertedResidual, models/
    mobilenetv3.py:91-131) -> MobileNetV3LargeFeatures {params,
    batch_stats}. The classifier tail (conv/avgpool/classifier.*) is
    ignored — the backbone taps stop at block 15."""
    sd = state_dict
    p: Tree = {"stem": _conv_nobias_raw(sd, "features.0.0.weight")}
    s: Tree = {}
    p["stem_bn"], s["stem_bn"] = bn_entries(sd, "features.0.1")

    def _se(prefix) -> Tree:
        return {
            "fc1": {"kernel": _dense_kernel(_get(sd, f"{prefix}.fc.0.weight")),
                    "bias": _get(sd, f"{prefix}.fc.0.bias")},
            "fc2": {"kernel": _dense_kernel(_get(sd, f"{prefix}.fc.2.weight")),
                    "bias": _get(sd, f"{prefix}.fc.2.bias")},
        }

    inp = 16
    for i, (k, t, c, se, hs, stride) in enumerate(_MBV3_LARGE_CFG):
        del k, hs, stride
        oup = _make_divisible(c * 1.0)
        hidden = _make_divisible(inp * t)
        pre = f"features.{i + 1}.conv"
        bp: Tree = {}
        bs: Tree = {}
        if inp == hidden:
            # dw-first layout: [0]dw [1]bn [2]act [3]SE [4]pw-lin [5]bn
            bp["dw"] = {"kernel": depthwise_kernel(_get(sd, f"{pre}.0.weight"))}
            bp["dw_bn"], bs["dw_bn"] = bn_entries(sd, f"{pre}.1")
            if se:
                bp["se"] = _se(f"{pre}.3")
            bp["pw_lin"] = _conv_nobias_raw(sd, f"{pre}.4.weight")
            bp["pw_lin_bn"], bs["pw_lin_bn"] = bn_entries(sd, f"{pre}.5")
        else:
            # [0]pw [1]bn [2]act [3]dw [4]bn [5]SE [6]act [7]pw-lin [8]bn
            bp["pw"] = _conv_nobias_raw(sd, f"{pre}.0.weight")
            bp["pw_bn"], bs["pw_bn"] = bn_entries(sd, f"{pre}.1")
            bp["dw"] = {"kernel": depthwise_kernel(_get(sd, f"{pre}.3.weight"))}
            bp["dw_bn"], bs["dw_bn"] = bn_entries(sd, f"{pre}.4")
            if se:
                bp["se"] = _se(f"{pre}.5")
            bp["pw_lin"] = _conv_nobias_raw(sd, f"{pre}.7.weight")
            bp["pw_lin_bn"], bs["pw_lin_bn"] = bn_entries(sd, f"{pre}.8")
        p[f"block{i + 1}"], s[f"block{i + 1}"] = bp, bs
        inp = oup
    return p, s


def _conv_nobias_raw(sd, key) -> Tree:
    return {"kernel": conv_kernel(_get(sd, key))}


# ---------------------------------------------------------------------------
# PSMNet (models_psmnet/stackhourglass.py + submodule.py)
# ---------------------------------------------------------------------------

def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (O,I,kd,kh,kw) -> flax (kd,kh,kw,I,O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def deconv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d (I,O,kd,kh,kw) -> flax ConvTranspose
    (kd,kh,kw,I,O) with flipped spatial dims (flax correlates)."""
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1))


def _convbn2d_psm(sd, prefix) -> Tuple[Tree, Tree]:
    """convbn (submodule.py:10-13): Sequential(Conv2d, BatchNorm2d)."""
    p: Tree = {"conv": {"kernel": conv_kernel(_get(sd, f"{prefix}.0.weight"))}}
    bp, bs = bn_entries(sd, f"{prefix}.1")
    p["bn"] = bp
    return p, {"bn": bs}


def _convbn3d_psm(sd, prefix) -> Tuple[Tree, Tree]:
    """convbn_3d (submodule.py:16-19)."""
    p: Tree = {"conv": {"kernel": conv3d_kernel(_get(sd, f"{prefix}.0.weight"))}}
    bp, bs = bn_entries(sd, f"{prefix}.1")
    p["bn"] = bp
    return p, {"bn": bs}


def _deconvbn3d_psm(sd, prefix) -> Tuple[Tree, Tree]:
    """Sequential(ConvTranspose3d, BatchNorm3d) (stackhourglass.py:25-29)."""
    p: Tree = {"deconv": {"kernel": deconv3d_kernel(
        _get(sd, f"{prefix}.0.weight"))}}
    bp, bs = bn_entries(sd, f"{prefix}.1")
    p["bn"] = bp
    return p, {"bn": bs}


def _psm_basic_block(sd, prefix, downsample: bool) -> Tuple[Tree, Tree]:
    """BasicBlock (submodule.py:21-43): conv1 = Sequential(convbn, ReLU),
    conv2 = convbn, optional downsample = Sequential(Conv2d, BN)."""
    p: Tree = {}
    s: Tree = {}
    p["c1"], s["c1"] = _convbn2d_psm(sd, f"{prefix}.conv1.0")
    p["c2"], s["c2"] = _convbn2d_psm(sd, f"{prefix}.conv2")
    if downsample:
        p["down"] = _conv_nobias(sd, f"{prefix}.downsample.0.weight")
        p["down_bn"], s["down_bn"] = bn_entries(sd, f"{prefix}.downsample.1")
    return p, s


def _psm_hourglass(sd, prefix) -> Tuple[Tree, Tree]:
    """hourglass (stackhourglass.py:10-50) -> Hourglass3D c1..c6."""
    p: Tree = {}
    s: Tree = {}
    p["c1"], s["c1"] = _convbn3d_psm(sd, f"{prefix}.conv1.0")
    p["c2"], s["c2"] = _convbn3d_psm(sd, f"{prefix}.conv2")
    p["c3"], s["c3"] = _convbn3d_psm(sd, f"{prefix}.conv3.0")
    p["c4"], s["c4"] = _convbn3d_psm(sd, f"{prefix}.conv4.0")
    p["c5"], s["c5"] = _deconvbn3d_psm(sd, f"{prefix}.conv5")
    p["c6"], s["c6"] = _deconvbn3d_psm(sd, f"{prefix}.conv6")
    return p, s


def import_psmnet(state_dict) -> Tuple[Tree, Tree]:
    """PSMNet stacked hourglass (stackhourglass.py:53-160) -> our PSMNet
    {params, batch_stats} trees (models/psmnet.py)."""
    sd = state_dict
    p: Tree = {}
    s: Tree = {}

    # feature_extraction (submodule.py:66-141)
    fp: Tree = {}
    fs: Tree = {}
    for i, idx in enumerate((0, 2, 4)):
        fp[f"first{i}"], fs[f"first{i}"] = _convbn2d_psm(
            sd, f"feature_extraction.firstconv.{idx}")
    layers = (("l1", "layer1", 3, False), ("l2", "layer2", 16, True),
              ("l3", "layer3", 3, True), ("l4", "layer4", 3, False))
    for ours, theirs, n, first_down in layers:
        for i in range(n):
            down = first_down and i == 0
            fp[f"{ours}_{i}"], fs[f"{ours}_{i}"] = _psm_basic_block(
                sd, f"feature_extraction.{theirs}.{i}", down)
    for i in (1, 2, 3, 4):
        fp[f"branch{i}"], fs[f"branch{i}"] = _convbn2d_psm(
            sd, f"feature_extraction.branch{i}.1")
    fp["last0"], fs["last0"] = _convbn2d_psm(
        sd, "feature_extraction.lastconv.0")
    fp["last1"] = _conv_nobias(sd, "feature_extraction.lastconv.2.weight")
    p["feature"], s["feature"] = fp, fs

    for ours, theirs in (("dres0a", "dres0.0"), ("dres0b", "dres0.2"),
                         ("dres1a", "dres1.0"), ("dres1b", "dres1.2")):
        p[ours], s[ours] = _convbn3d_psm(sd, theirs)
    for ours, theirs in (("dres2", "dres2"), ("dres3", "dres3"),
                         ("dres4", "dres4")):
        p[ours], s[ours] = _psm_hourglass(sd, theirs)
    for k in (1, 2, 3):
        p[f"classif{k}a"], s[f"classif{k}a"] = _convbn3d_psm(
            sd, f"classif{k}.0")
        p[f"classif{k}b"] = {"kernel": conv3d_kernel(
            _get(sd, f"classif{k}.2.weight"))}
    return p, s


# ---------------------------------------------------------------------------
# ext_small family (models/dsnet_t2_ext_small.py)
# ---------------------------------------------------------------------------

def _rcu(sd, prefix, use_deconv=True) -> Tuple[Tree, Tree]:
    """RCU (dsnet_t2_ext_small.py:43-64): c1, c2, then d3 (deconvbn) when
    use_deconv else c3 (convbn) — the torch module constructs only one."""
    p: Tree = {}
    s: Tree = {}
    for name in ("c1", "c2"):
        cp, cs = _convbn(sd, f"{prefix}.{name}.0")
        p[name], s[name] = cp, cs
    if use_deconv:
        cp, cs = _deconvbn(sd, f"{prefix}.d3.0")
        p["d3"], s["d3"] = cp, cs
    else:
        cp, cs = _convbn(sd, f"{prefix}.c3.0")
        p["c3"], s["c3"] = cp, cs
    return p, s


def import_ext_small(state_dict, variant="edge",
                     backbone="densenet") -> Tuple[Tree, Tree]:
    """Ext_small (:130-381) / Ext_smallv2 (:382-638) / Ext_smallv0
    (:639-894), aspp 0 -> ExtSmall {params, batch_stats}. conv1d_3 is
    constructed but unused in every variant's forward — skipped, like the
    flagship importer does."""
    sd = state_dict
    use_dc = variant != "edge"
    p: Tree = {}
    s: Tree = {}
    p["features"], s["features"] = import_piramidnet2(sd, backbone=backbone)

    if variant == "edge":
        for i in (0, 1, 2):
            cp, cs = _convbn(sd, f"conv2d_ba{i}.0")
            p[f"conv2d_ba{i}"], s[f"conv2d_ba{i}"] = cp, cs

    seg_p: Tree = {}
    seg_s: Tree = {}
    seg_p["conv1d_1"] = _conv_plain(sd, "segNet.conv1d_1", 64)
    seg_p["cdu1"], seg_s["cdu1"] = _rcu(sd, "segNet.Conv2DownUp1", use_dc)
    seg_p["conv1d_2"] = _conv_plain(sd, "segNet.conv1d_2", 32)
    seg_p["cdu2"], seg_s["cdu2"] = _rcu(sd, "segNet.Conv2DownUp2.0", use_dc)
    seg_p["out"] = {"kernel": conv_kernel(
        _get(sd, "segNet.Conv2DownUp2.1.c2d.weight"))}
    p["segNet"], s["segNet"] = seg_p, seg_s

    p["corrConv2d"] = _conv_plain(sd, "corrConv2d", 128)
    for ours, theirs in (("rcu3", "Conv2DownUp3"), ("rcu4", "Conv2DownUp4"),
                         ("rcu5", "Conv2DownUp5"), ("rcu6", "Conv2DownUp6"),
                         ("rcu7", "Conv2DownUp7"), ("rcu8", "Conv2DownUp8"),
                         ("rcu9", "Conv2DownUp9"), ("rcu10", "Conv2DownUp10")):
        p[ours], s[ours] = _rcu(sd, theirs, use_dc)
    p["conv1d_2"] = _conv_plain(sd, "conv1d_2", 64)
    p["dispoutConv"] = {"kernel": deconv_as_conv_kernel(
        _get(sd, "dispoutConv.ct2d.weight"))}
    p["conv1d_4"] = _conv_plain(sd, "conv1d_4", 128)
    p["conv1d_at"] = _conv_plain(sd, "conv1d_at", 1)
    p["conv1d_5"] = _conv_plain(sd, "conv1d_5", 32)
    p["rcu11"], s["rcu11"] = _rcu(sd, "Conv2DownUp11.0", use_dc)
    p["rcu11_out"] = {"kernel": conv_kernel(
        _get(sd, "Conv2DownUp11.1.c2d.weight"))}
    return p, s


# ---------------------------------------------------------------------------
# warp family (models/dsnet_t2_warp.py)
# ---------------------------------------------------------------------------

def import_minidsnet_divide(state_dict, variant="divide") -> Tuple[Tree, Tree]:
    """The warp family (models/dsnet_t2_warp.py) -> MiniDSNetDivide /
    MiniDSNetDivideSoftmax / MiniDSNetDivideDisp {params, batch_stats}.
    ``variant``: 'divide' (:577-703), 'soft' (:169-308), 'disp' (:704-836),
    'disp2' (:839-972) — the module sets differ only in the Conv2DownUp7
    attention head (see below).

    The warp-family piramidNet2 (:339-480) adds a 4th pyramid tap
    (branch3_0/branch3_1). conv2d_ba0/2/3, conv1d_3 and segNetB2 are
    constructed by the torch nets but unused by forward — skipped,
    like the flagship importer's conv1d_3."""
    sd = state_dict
    p: Tree = {}
    s: Tree = {}
    p["features"], s["features"] = import_piramidnet2(
        sd, branches=((0, 5), (1, 4), (2, 3), (3, 2)))
    cp, cs = _convbn(sd, "conv2d_ba1.0")
    p["conv2d_ba1"], s["conv2d_ba1"] = cp, cs

    seg_p: Tree = {}
    seg_s: Tree = {}
    seg_p["conv1d_1"] = _conv_plain(sd, "segNet.conv1d_1", 64)
    seg_p["cdu1"], seg_s["cdu1"] = _cdu(sd, "segNet.Conv2DownUp1")
    seg_p["conv1d_2"] = _conv_plain(sd, "segNet.conv1d_2", 32)
    seg_p["cdu2"], seg_s["cdu2"] = _cdu(sd, "segNet.Conv2DownUp2.0",
                                        last=False)
    seg_p["out"] = _deconv_out(sd, "segNet.Conv2DownUp2.1")
    p["segNet"], s["segNet"] = seg_p, seg_s

    p["corrConv2d"] = _conv_plain(sd, "corrConv2d", 128)
    p["cdu3"], s["cdu3"] = _cdu(sd, "Conv2DownUp3")
    p["cdu4"], s["cdu4"] = _cdu(sd, "Conv2DownUp4")
    p["conv1d_2"] = _conv_plain(sd, "conv1d_2", 64)
    p["cdu5"], s["cdu5"] = _cdu(sd, "Conv2DownUp5", last=False)
    p["dispoutConv"] = _deconv_out(sd, "dispoutConv")
    if variant == "soft":
        # minidsnetDivideSoftmax (:169-308): Conv2DownUp7 is a Sequential
        # (Conv2DownUp(96,64,lastLayer=False), ConvTranspose out(labels));
        # the sigmoid conv1d_at_d attention is replaced by per-class softmax
        p["cdu7"], s["cdu7"] = _cdu(sd, "Conv2DownUp7.0", last=False)
        p["cdu7_out"] = _deconv_out(sd, "Conv2DownUp7.1")
    else:
        # divide (:577-703) / disp (:704-836) / disp2 (:839-972): plain
        # Conv2DownUp7 + 1x1 sigmoid attention (input 96 ch for divide,
        # 128 for the disp variants — key layout identical)
        p["cdu7"], s["cdu7"] = _cdu(sd, "Conv2DownUp7")
        p["conv1d_at_d"] = _conv_plain(sd, "conv1d_at_d", 1)
    return p, s


# ---------------------------------------------------------------------------
# minidsnetExt_deeplab 'sdnet_mini_ext_dlab' (dsnet_t2.py:2426-2729)
# ---------------------------------------------------------------------------


def _plain_conv_bn_seq(sd, prefix) -> Tuple[Tree, Tree]:
    """nn.Sequential(Conv2d bias-free, Norm2d, ReLU) -> ConvBN."""
    w = conv_kernel(_get(sd, f"{prefix}.0.weight"))
    p, s = bn_entries(sd, f"{prefix}.1")
    return {"conv": {"kernel": w}, "bn": p}, {"bn": s}


def _bottleneck(sd, prefix, downsample: bool) -> Tuple[Tree, Tree]:
    p: Tree = {}
    s: Tree = {}
    for conv, bnn in (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")):
        p[conv] = {"kernel": conv_kernel(_get(sd, f"{prefix}.{conv}.weight"))}
        bp, bs = bn_entries(sd, f"{prefix}.{bnn}")
        p[bnn], s[bnn] = bp, bs
    if downsample:
        p["down_conv"] = {"kernel": conv_kernel(
            _get(sd, f"{prefix}.downsample.0.weight"))}
        bp, bs = bn_entries(sd, f"{prefix}.downsample.1")
        p["down_bn"], s["down_bn"] = bp, bs
    return p, s


def import_deeplabv3plus_hanet(sd, prefix="resnet_features",
                               layers=(3, 4, 23, 3)) -> Tuple[Tree, Tree]:
    """deeplabV3plus(return_layers=True) (models_hanet/resnet_pytorch.py:
    70-232, trunk resnet-101, variant 'D') -> DeeplabV3PlusFeatures.

    layer0 Sequential indices: 0/1=conv1/bn1, 3/4=conv2/bn2, 6/7=conv3/bn3
    (ResNet3X3 stem, Resnet.py:137-163). final1_1/final1_2/final2 are
    constructed but unused when return_layers=True — skipped."""
    p: Tree = {}
    s: Tree = {}
    trunk_p: Tree = {}
    trunk_s: Tree = {}
    for ours, idx in (("conv1", 0), ("conv2", 3), ("conv3", 6)):
        trunk_p[ours] = {"kernel": conv_kernel(
            _get(sd, f"{prefix}.layer0.{idx}.weight"))}
    for ours, idx in (("bn1", 1), ("bn2", 4), ("bn3", 7)):
        bp, bs = bn_entries(sd, f"{prefix}.layer0.{idx}")
        trunk_p[ours], trunk_s[ours] = bp, bs
    for li, nblocks in enumerate(layers):
        for bi in range(nblocks):
            bp, bs = _bottleneck(sd, f"{prefix}.layer{li + 1}.{bi}",
                                 downsample=(bi == 0))
            trunk_p[f"layer{li + 1}_block{bi}"] = bp
            trunk_s[f"layer{li + 1}_block{bi}"] = bs
    p["trunk"], s["trunk"] = trunk_p, trunk_s

    aspp_p: Tree = {}
    aspp_s: Tree = {}
    for i in range(4):
        cp, cs = _plain_conv_bn_seq(sd, f"{prefix}.aspp.features.{i}")
        aspp_p[f"feat{i}_conv"] = cp["conv"]
        aspp_p[f"feat{i}_bn"], aspp_s[f"feat{i}_bn"] = cp["bn"], cs["bn"]
    cp, cs = _plain_conv_bn_seq(sd, f"{prefix}.aspp.img_conv")
    aspp_p["img_conv"] = cp["conv"]
    aspp_p["img_bn"], aspp_s["img_bn"] = cp["bn"], cs["bn"]
    p["aspp"], s["aspp"] = aspp_p, aspp_s

    p["bot_aspp"], s["bot_aspp"] = _plain_conv_bn_seq(sd, f"{prefix}.bot_aspp")
    p["bot_fine"], s["bot_fine"] = _plain_conv_bn_seq(sd, f"{prefix}.bot_fine")
    return p, s


def import_ext_dlab(state_dict, labels=2, conv_deconv_out=0, ablation=(),
                    hanet=False) -> Tuple[Tree, Tree]:
    """minidsnetExt_deeplab 'sdnet_mini_ext_dlab' (dsnet_t2.py:2426-2729,
    aspp 0) -> MiniDSNetExtDeeplab {params, batch_stats}. conv1d_3 and the
    backbone's final1_*/final2 are unused by forward — skipped."""
    from .torch_import import import_hanet_conv

    sd = state_dict
    p: Tree = {}
    s: Tree = {}
    p["features"], s["features"] = import_deeplabv3plus_hanet(sd)

    seg_p: Tree = {}
    seg_s: Tree = {}
    seg_p["conv1d_1"] = _conv_plain(sd, "segNet.conv1d_1", 64)
    seg_p["cdu1"], seg_s["cdu1"] = _cdu(sd, "segNet.Conv2DownUp1")
    seg_p["conv1d_2"] = _conv_plain(sd, "segNet.conv1d_2", 32)
    seg_p["cdu2"], seg_s["cdu2"] = _cdu(sd, "segNet.Conv2DownUp2.0",
                                        last=False)
    seg_p["out"] = _deconv_out(sd, "segNet.Conv2DownUp2.1")
    p["segNet"], s["segNet"] = seg_p, seg_s

    p["corrConv2d"] = _conv_plain(sd, "corrConv2d", 128)
    p["cdu3"], s["cdu3"] = _cdu(sd, "Conv2DownUp3")
    p["cdu4"], s["cdu4"] = _cdu(sd, "Conv2DownUp4")
    p["conv1d_2"] = _conv_plain(sd, "conv1d_2", 64)
    p["cdu5"], s["cdu5"] = _cdu(sd, "Conv2DownUp5", last=False)
    p["dispoutConv"] = _deconv_out(sd, "dispoutConv")
    p["conv1d_4"] = _conv_plain(sd, "conv1d_4", 128)
    p["cdu6"], s["cdu6"] = _cdu(sd, "Conv2DownUp6")
    if "no_dec3" not in ablation:
        p["cdu7"], s["cdu7"] = _cdu(sd, "Conv2DownUp7")
        p["cdu8"], s["cdu8"] = _cdu(sd, "Conv2DownUp8")
        p["cdu9"], s["cdu9"] = _cdu(sd, "Conv2DownUp9")
        p["conv1d_at_d"] = _conv_plain(sd, "conv1d_at_d", 1)
        p["conv1d_at_s"] = _conv_plain(sd, "conv1d_at_s", 1)
    p["cdu10"], s["cdu10"] = _cdu(sd, "Conv2DownUp10")
    p["conv1d_5"] = _conv_plain(sd, "conv1d_5", 32)
    if conv_deconv_out:
        p["cdu11"], s["cdu11"] = _cdu(sd, "Conv2DownUp11.0", last=False)
        p["convOutput2"] = {"kernel": conv_kernel(
            _get(sd, "convOutput2.c2d.weight"))}
        if conv_deconv_out == 2:
            p["convOutput"] = _deconv_out(sd, "convOutput")
    else:
        p["cdu11"], s["cdu11"] = _cdu(sd, "Conv2DownUp11.0", last=False)
        p["cdu11_out"] = _deconv_out(sd, "Conv2DownUp11.1")
    if hanet:
        p["hanet_last"], s["hanet_last"] = import_hanet_conv(sd)
    return p, s


# ---------------------------------------------------------------------------
# EncoderDecoderNet (models_deeplab/net.py:12-79) — UNet-hypercolumn segmentor
# ---------------------------------------------------------------------------


def _deconv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I,O,kh,kw) -> flax ConvTranspose (kh,kw,I,O)
    with spatial flip (flax conv_transpose correlates, torch convolves)."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def _abn_entries(sd, prefix):
    """_ActivatedBatchNorm (models_deeplab/common.py:5-23): .bn BatchNorm."""
    return bn_entries(sd, f"{prefix}.bn")


def _scse_block(sd, prefix) -> Tree:
    """SCSEBlock (scse.py:23-43): channel_excitation Linears (with bias) +
    bias-free 1x1 spatial conv."""
    return {
        "fc1": {"kernel": _dense_kernel(
            _get(sd, f"{prefix}.channel_excitation.0.weight")),
            "bias": _get(sd, f"{prefix}.channel_excitation.0.bias")},
        "fc2": {"kernel": _dense_kernel(
            _get(sd, f"{prefix}.channel_excitation.2.weight")),
            "bias": _get(sd, f"{prefix}.channel_excitation.2.bias")},
        "spatial": {"kernel": conv_kernel(
            _get(sd, f"{prefix}.spatial_se.weight"))},
    }


def _decoder_scse(sd, prefix) -> Tuple[Tree, Tree]:
    """DecoderUnetSCSE (decoder.py:10-22): Sequential(conv3x3+bias, ABN,
    SCSE, ConvTranspose4x4 s2 p1 + bias)."""
    p: Tree = {
        "conv": {"kernel": conv_kernel(_get(sd, f"{prefix}.block.0.weight")),
                 "bias": _get(sd, f"{prefix}.block.0.bias")},
        "scse": _scse_block(sd, f"{prefix}.block.2"),
        "up": {"kernel": _deconv2d_kernel(
            _get(sd, f"{prefix}.block.3.weight")),
            "bias": _get(sd, f"{prefix}.block.3.bias")},
    }
    bp, bs = _abn_entries(sd, f"{prefix}.block.1")
    p["bn"] = bp
    return p, {"bn": bs}


def import_encdec(state_dict, enc_type="resnet18",
                  dec_type="unet_scse") -> Tuple[Tree, Tree]:
    """EncoderDecoderNet (models_deeplab/net.py:12-79) with a torchvision
    resnet encoder split into 5 stages (encoder.py:8-37) ->
    models.encdec.EncoderDecoderNet {params, batch_stats}."""
    dec_fn = {"unet_scse": _decoder_scse, "unet_oc": _decoder_oc,
              "unet_seibn": _decoder_seibn}[dec_type]
    sd = state_dict
    p: Tree = {}
    s: Tree = {}
    # encoder1 = Sequential(conv1, bn1, relu, maxpool)
    p["stem"] = {"kernel": conv_kernel(_get(sd, "encoder1.0.weight"))}
    bp, bs = bn_entries(sd, "encoder1.1")
    p["stem_bn"], s["stem_bn"] = bp, bs
    layers = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
              "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
              "resnet152": (3, 8, 36, 3)}[enc_type]
    bottleneck = enc_type not in ("resnet18", "resnet34")
    convs = (("c1", "conv1", "b1", "bn1"), ("c2", "conv2", "b2", "bn2")) + (
        (("c3", "conv3", "b3", "bn3"),) if bottleneck else ())
    for li, n in enumerate(layers):
        for bi in range(n):
            pre = f"encoder{li + 2}.{bi}"
            bp_: Tree = {}
            bs_: Tree = {}
            for ours_c, theirs_c, ours_b, theirs_b in convs:
                bp_[ours_c] = {"kernel": conv_kernel(
                    _get(sd, f"{pre}.{theirs_c}.weight"))}
                q, r = bn_entries(sd, f"{pre}.{theirs_b}")
                bp_[ours_b], bs_[ours_b] = q, r
            if f"{pre}.downsample.0.weight" in sd:
                bp_["down"] = {"kernel": conv_kernel(
                    _get(sd, f"{pre}.downsample.0.weight"))}
                q, r = bn_entries(sd, f"{pre}.downsample.1")
                bp_["down_bn"], bs_["down_bn"] = q, r
            p[f"l{li + 1}_b{bi}"], s[f"l{li + 1}_b{bi}"] = bp_, bs_
    for ours, theirs in (("center", "center"), ("dec5", "decoder5"),
                         ("dec4", "decoder4"), ("dec3", "decoder3"),
                         ("dec2", "decoder2"), ("dec1", "decoder1")):
        p[ours], s[ours] = dec_fn(sd, theirs)
    p["logits1"] = {"kernel": conv_kernel(_get(sd, "logits.0.weight")),
                    "bias": _get(sd, "logits.0.bias")}
    bp, bs = _abn_entries(sd, "logits.1")
    p["logits_bn"], s["logits_bn"] = bp, bs
    p["logits2"] = {"kernel": conv_kernel(_get(sd, "logits.2.weight")),
                    "bias": _get(sd, "logits.2.bias")}
    return p, s


def _decoder_oc(sd, prefix) -> Tuple[Tree, Tree]:
    """DecoderUnetOC (decoder.py:38-52): Sequential(conv3x3, ABN, BaseOC,
    ConvTranspose). BaseOC.block = (conv3x3, ABN, BaseOC_Context) with the
    context = one SelfAttentionBlock2D stage + conv_bn_dropout (oc.py)."""
    p: Tree = {
        "conv": {"kernel": conv_kernel(_get(sd, f"{prefix}.block.0.weight")),
                 "bias": _get(sd, f"{prefix}.block.0.bias")},
        "up": {"kernel": _deconv2d_kernel(
            _get(sd, f"{prefix}.block.3.weight")),
            "bias": _get(sd, f"{prefix}.block.3.bias")},
    }
    s: Tree = {}
    bp, bs = _abn_entries(sd, f"{prefix}.block.1")
    p["bn"], s["bn"] = bp, bs
    base = f"{prefix}.block.2.block"
    ocp: Tree = {
        "conv": {"kernel": conv_kernel(_get(sd, f"{base}.0.weight")),
                 "bias": _get(sd, f"{base}.0.bias")},
    }
    ocs: Tree = {}
    bp, bs = _abn_entries(sd, f"{base}.1")
    ocp["bn"], ocs["bn"] = bp, bs
    attn_pre = f"{base}.2.stages.0"
    ap: Tree = {
        "f_key": {"kernel": conv_kernel(
            _get(sd, f"{attn_pre}.f_key.0.weight")),
            "bias": _get(sd, f"{attn_pre}.f_key.0.bias")},
        "f_value": {"kernel": conv_kernel(
            _get(sd, f"{attn_pre}.f_value.weight")),
            "bias": _get(sd, f"{attn_pre}.f_value.bias")},
        "W": {"kernel": conv_kernel(_get(sd, f"{attn_pre}.W.weight")),
              "bias": _get(sd, f"{attn_pre}.W.bias")},
    }
    ass: Tree = {}
    bp, bs = _abn_entries(sd, f"{attn_pre}.f_key.1")
    ap["key_bn"], ass["key_bn"] = bp, bs
    ocp["attn"], ocs["attn"] = ap, ass
    ocp["proj"] = {"kernel": conv_kernel(
        _get(sd, f"{base}.2.conv_bn_dropout.0.weight")),
        "bias": _get(sd, f"{base}.2.conv_bn_dropout.0.bias")}
    bp, bs = _abn_entries(sd, f"{base}.2.conv_bn_dropout.1")
    ocp["proj_bn"], ocs["proj_bn"] = bp, bs
    p["oc"], s["oc"] = ocp, ocs
    return p, s


def _decoder_seibn(sd, prefix) -> Tuple[Tree, Tree]:
    """DecoderUnetSEIBN (decoder.py:25-35): SELayer (bias-free Linears) +
    ImprovedIBNaDecoderBlock (ibn.py:24-38: 1x1 reduce, IBN half-IN/half-BN,
    deconv, ABN, 1x1 proj, ABN)."""
    p: Tree = {
        "se": {
            "fc1": {"kernel": _dense_kernel(
                _get(sd, f"{prefix}.block.0.fc.0.weight"))},
            "fc2": {"kernel": _dense_kernel(
                _get(sd, f"{prefix}.block.0.fc.2.weight"))},
        },
    }
    s: Tree = {}
    ibn = f"{prefix}.block.1.block"
    p["reduce"] = {"kernel": conv_kernel(_get(sd, f"{ibn}.0.weight")),
                   "bias": _get(sd, f"{ibn}.0.bias")}
    p["inorm"] = {"scale": _get(sd, f"{ibn}.1.IN.0.weight"),
                  "bias": _get(sd, f"{ibn}.1.IN.0.bias")}
    bp, bs = _abn_entries(sd, f"{ibn}.1.BN")
    p["bnorm"], s["bnorm"] = bp, bs
    p["up"] = {"kernel": _deconv2d_kernel(_get(sd, f"{ibn}.2.weight")),
               "bias": _get(sd, f"{ibn}.2.bias")}
    bp, bs = _abn_entries(sd, f"{ibn}.3")
    p["up_bn"], s["up_bn"] = bp, bs
    p["proj"] = {"kernel": conv_kernel(_get(sd, f"{ibn}.4.weight")),
                 "bias": _get(sd, f"{ibn}.4.bias")}
    bp, bs = _abn_entries(sd, f"{ibn}.5")
    p["proj_bn"], s["proj_bn"] = bp, bs
    return p, s
