"""torch -> flax weight conversion.

The reference loads torchvision-pretrained backbones (densenet121 et al.,
models/densenet.py:248+) and .pth.tar training checkpoints
(utilTorch_loadweight.py). This module imports such state dicts into our
flax parameter trees:

* conv:            torch (O,I,kh,kw)      -> flax (kh,kw,I,O)
* depthwise conv:  torch (C,1,kh,kw)      -> flax (kh,kw,1,C)
* stride-1 'same' transposed conv heads:  our DeconvBN/ConvOut run them as
  SAME convs with a flipped kernel (models/blocks.py), so torch
  ConvTranspose2d weights (I,O,kh,kw) import as flip(kh,kw) + transpose.
* batchnorm:       weight/bias/running_mean/running_var ->
                   scale/bias + batch_stats mean/var
* linear:          torch (O,I) -> flax (I,O)

Only name-level mapping helpers are provided generically; the densenet
backbone mapper is wired fully (that is the pretrained path the flagship
uses).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def depthwise_kernel(w: np.ndarray) -> np.ndarray:
    # torch (C,1,kh,kw) -> flax (kh,kw,1,C)
    return np.transpose(w, (2, 3, 1, 0))


def deconv_as_conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I,O,kh,kw) -> our SAME-conv parameterization:
    flip spatial dims, then (kh,kw,I,O)."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def bn_entries(sd: Mapping[str, np.ndarray], prefix: str):
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
         "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


def import_densenet121(
    state_dict: Mapping[str, np.ndarray],
    block_config=(6, 12, 24, 16),
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torchvision densenet121 'features.*' state dict into our
    DenseNetFeatures params/batch_stats trees (models/densenet.py layout).

    Accepts both torchvision key styles ('features.denseblock1.denselayer1.
    norm1.weight' and the legacy dotted 'norm.1' form)."""
    sd = {k.replace("norm.1", "norm1").replace("norm.2", "norm2")
           .replace("conv.1", "conv1").replace("conv.2", "conv2"): v
          for k, v in state_dict.items()}

    def get(k):
        return np.asarray(sd[k])

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv0"] = {"kernel": conv_kernel(get("features.conv0.weight"))}
    p, s = bn_entries(sd, "features.norm0")
    params["norm0"] = p
    stats["norm0"] = s

    for bi, n_layers in enumerate(block_config):
        bname = f"denseblock{bi + 1}"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for li in range(n_layers):
            lname = f"denselayer{li + 1}"
            pre = f"features.{bname}.{lname}"
            lp: Dict[str, Any] = {}
            ls: Dict[str, Any] = {}
            for norm, conv in (("norm1", "conv1"), ("norm2", "conv2")):
                np_, ns_ = bn_entries(sd, f"{pre}.{norm}")
                lp[norm] = np_
                ls[norm] = ns_
                lp[conv] = {"kernel": conv_kernel(get(f"{pre}.{conv}.weight"))}
            bp[lname] = lp
            bs[lname] = ls
        params[bname] = bp
        stats[bname] = bs
        if bi < len(block_config) - 1:
            tname = f"transition{bi + 1}"
            tp, ts = bn_entries(sd, f"features.{tname}.norm")
            params[tname] = {
                "norm": tp,
                "conv": {"kernel": conv_kernel(
                    get(f"features.{tname}.conv.weight")
                )},
            }
            stats[tname] = {"norm": ts}

    p, s = bn_entries(sd, "features.norm5")
    params["norm5"] = p
    stats["norm5"] = s
    return params, stats


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pth.tar into numpy (torch is CPU-available here)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def apply_backbone_params(variables: Dict[str, Any], backbone_params,
                          backbone_stats, path=("features", "backbone")):
    """Graft imported backbone weights into a model's variable tree at
    params/<path...> and batch_stats/<path...> (in-place on copies)."""
    import copy

    out = copy.deepcopy(dict(variables))
    node = out["params"]
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = backbone_params
    node = out.setdefault("batch_stats", {})
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = backbone_stats
    return out


# ---------------------------------------------------------------------------
# Full-model import: minidsnetExt (dsnet_t2.py:941-1299) -> MiniDSNetExt
# ---------------------------------------------------------------------------

def _get(sd, key):
    return np.asarray(sd[key])


def _convbn(sd, prefix):
    """convbn (dsnet_t2.py:16-46): Sequential(conv2dSame bias-free, BN).
    torch keys {prefix}.layers.0.c2d.weight + {prefix}.layers.1.* ->
    our ConvBN {conv:{kernel}, bn:{scale,bias}} + stats."""
    w = conv_kernel(_get(sd, f"{prefix}.layers.0.c2d.weight"))
    p, s = bn_entries(sd, f"{prefix}.layers.1")
    return {"conv": {"kernel": w}, "bn": p}, {"bn": s}


def _deconvbn(sd, prefix):
    """deconvbn (dsnet_t2.py:48-77): stride-1 transposed conv == SAME conv
    with flipped kernel (models/blocks.py DeconvBN)."""
    w = deconv_as_conv_kernel(_get(sd, f"{prefix}.layers.0.ct2d.weight"))
    p, s = bn_entries(sd, f"{prefix}.layers.1")
    return {"deconv": {"kernel": w}, "bn": p}, {"bn": s}


def _cdu(sd, prefix, last=True):
    """Conv2DownUp (dsnet_t2.py:80-117) -> blocks.Conv2DownUp. torch wraps
    each unit in Sequential(convbn/deconvbn, ReLU, Dropout) -> index .0."""
    params, stats = {}, {}
    for name in ("c1", "c2", "c3"):
        p, s = _convbn(sd, f"{prefix}.{name}.0")
        params[name], stats[name] = p, s
    for name in ("d3", "d4") + (("d5",) if last else ()):
        p, s = _deconvbn(sd, f"{prefix}.{name}.0")
        params[name], stats[name] = p, s
    return params, stats


def _conv_plain(sd, prefix, features):
    """conv2dSame (bias=False default, torch_model.py:236-283) inside a
    Sequential -> our bias-free ConvBN(batchnorm=False)."""
    del features  # kept for call-site readability
    w = conv_kernel(_get(sd, f"{prefix}.0.c2d.weight"))
    return {"conv": {"kernel": w}}


def _deconv_out(sd, prefix):
    """ConvTranspose2dSame head (bias=False, init_he=False) -> ConvOut."""
    return {"conv": {"kernel": deconv_as_conv_kernel(
        _get(sd, f"{prefix}.ct2d.weight"))}}


def ref_densenet_to_torchvision_keys(sd):
    """The reference's modified densenet (models/densenet.py:150-206,
    defaultConfig=False) flattens blocks/transitions into one ModuleList
    ``denseblock`` (even indices = blocks, odd = transitions) with ``conv0``
    and ``norm5`` hoisted out of ``features``. Rewrite to the torchvision
    key style import_densenet121 understands."""
    import re

    out = {}
    for k, v in sd.items():
        if "num_batches_tracked" in k or k.startswith("classifier."):
            continue
        m = re.match(r"denseblock\.(\d+)\.(.*)", k)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            if idx % 2 == 0:
                out[f"features.denseblock{idx // 2 + 1}.{rest}"] = v
            else:
                out[f"features.transition{idx // 2 + 1}.{rest}"] = v
        elif k.startswith("conv0.") or k.startswith("norm5."):
            out[f"features.{k}"] = v
        else:
            out[k] = v  # features.norm0.* is already in place
    return out


def import_resnet_deeplab(sd, layers=(3, 4, 6, 3)):
    """The reference's dilated multi-grid resnet (models/resnet_deeplab.py:
    45-170, os=16) -> models.resnet_deeplab.ResNetDeeplabFeatures
    (stem='7x7', multigrid=True). layer4 is the 3-block MG unit."""
    p, s = {}, {}
    p["conv1"] = {"kernel": conv_kernel(_get(sd, "conv1.weight"))}
    bp, bs = bn_entries(sd, "bn1")
    p["bn1"], s["bn1"] = bp, bs

    def block(pre, has_down):
        bp_, bs_ = {}, {}
        for conv, bnn in (("conv1", "bn1"), ("conv2", "bn2"),
                          ("conv3", "bn3")):
            bp_[conv] = {"kernel": conv_kernel(_get(sd, f"{pre}.{conv}.weight"))}
            q, r = bn_entries(sd, f"{pre}.{bnn}")
            bp_[bnn], bs_[bnn] = q, r
        if has_down:
            bp_["down_conv"] = {"kernel": conv_kernel(
                _get(sd, f"{pre}.downsample.0.weight"))}
            q, r = bn_entries(sd, f"{pre}.downsample.1")
            bp_["down_bn"], bs_["down_bn"] = q, r
        return bp_, bs_

    for li, n in enumerate(layers[:3]):
        for bi in range(n):
            has_down = f"layer{li + 1}.{bi}.downsample.0.weight" in sd
            bp, bs = block(f"layer{li + 1}.{bi}", has_down)
            p[f"layer{li + 1}_block{bi}"] = bp
            s[f"layer{li + 1}_block{bi}"] = bs
    for bi in range(3):  # MG unit
        has_down = f"layer4.{bi}.downsample.0.weight" in sd
        bp, bs = block(f"layer4.{bi}", has_down)
        p[f"layer4_block{bi}"], s[f"layer4_block{bi}"] = bp, bs
    return p, s


def import_efficientnet(sd) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """efficientnet_pytorch state dict (unprefixed `_conv_stem`/`_blocks.i`/
    `_conv_head` keys — the layout EfficientNet.from_pretrained delivers,
    models/dsnet_t2.py:1956) -> our EfficientNetFeatures params/batch_stats
    (models/efficientnet.py layout)."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p["stem"] = {"kernel": conv_kernel(np.asarray(sd["_conv_stem.weight"]))}
    p["stem_bn"], s["stem_bn"] = bn_entries(sd, "_bn0")
    i = 0
    while f"_blocks.{i}._depthwise_conv.weight" in sd:
        pre = f"_blocks.{i}"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        if f"{pre}._expand_conv.weight" in sd:
            bp["expand"] = {"kernel": conv_kernel(
                np.asarray(sd[f"{pre}._expand_conv.weight"]))}
            bp["expand_bn"], bs["expand_bn"] = bn_entries(sd, f"{pre}._bn0")
        bp["dw"] = {"kernel": conv_kernel(
            np.asarray(sd[f"{pre}._depthwise_conv.weight"]))}
        bp["dw_bn"], bs["dw_bn"] = bn_entries(sd, f"{pre}._bn1")
        for ours, theirs in (("se_reduce", "_se_reduce"),
                             ("se_expand", "_se_expand")):
            bp[ours] = {"kernel": conv_kernel(
                np.asarray(sd[f"{pre}.{theirs}.weight"])),
                "bias": np.asarray(sd[f"{pre}.{theirs}.bias"])}
        bp["project"] = {"kernel": conv_kernel(
            np.asarray(sd[f"{pre}._project_conv.weight"]))}
        bp["project_bn"], bs["project_bn"] = bn_entries(sd, f"{pre}._bn2")
        p[f"block{i}"], s[f"block{i}"] = bp, bs
        i += 1
    p["head"] = {"kernel": conv_kernel(np.asarray(sd["_conv_head.weight"]))}
    p["head_bn"], s["head_bn"] = bn_entries(sd, "_bn1")
    return p, s


def import_piramidnet2(state_dict, prefix="resnet_features",
                       block_config=(6, 12, 24, 16),
                       branches=((0, 5), (1, 4), (2, 3)),
                       backbone="densenet"):
    """piramidNet2 (dsnet_t2.py:1893-2083) -> models.pyramid.PiramidNet2
    (densenet / dilated-resnet backbone + branch{t}_{k} convbn pyramid
    branches — the forward is backbone-agnostic, :2016-2083)."""
    params, stats = {}, {}
    bb = {k[len(f"{prefix}.resnet_features."):]: v
          for k, v in state_dict.items()
          if k.startswith(f"{prefix}.resnet_features.")}
    if backbone in ("resnet50", "resnet101"):
        layers = (3, 4, 6, 3) if backbone == "resnet50" else (3, 4, 23, 3)
        params["backbone"], stats["backbone"] = import_resnet_deeplab(
            bb, layers=layers)
    elif backbone.startswith("efficientnet"):
        params["backbone"], stats["backbone"] = import_efficientnet(bb)
    else:
        dn_blocks = {"densenet": (6, 12, 24, 16), "dn169": (6, 12, 32, 32),
                     "dn201": (6, 12, 48, 32), "dn161": (6, 12, 36, 24)}
        block_config = dn_blocks.get(backbone, block_config)
        if "features.conv0.weight" not in bb:
            bb = ref_densenet_to_torchvision_keys(bb)
        params["backbone"], stats["backbone"] = import_densenet121(
            bb, block_config=block_config
        )
    for tap, n in branches:
        for k in range(n):
            name = f"branch{tap}_{k}"
            # Sequential: 0=AvgPool, 1=convbn, 2=ReLU
            p, s = _convbn(state_dict, f"{prefix}.{name}.1")
            params[name], stats[name] = p, s
    return params, stats


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (O,I,k) -> flax (k,I,O)."""
    return np.transpose(w, (2, 1, 0))


def import_aspp_dsnet(sd, prefix="aspp"):
    """dsnet-flavor ASPP (models/aspp.py:34-112) -> models.aspp.ASPP."""
    p, s = {}, {}
    for i in (1, 2, 3, 4):
        p[f"aspp{i}_conv"] = {"kernel": conv_kernel(
            _get(sd, f"{prefix}.aspp{i}.atrous_conv.weight"))}
        bp, bs = bn_entries(sd, f"{prefix}.aspp{i}.bn")
        p[f"aspp{i}_bn"], s[f"aspp{i}_bn"] = bp, bs
    p["gp_conv"] = {"kernel": conv_kernel(
        _get(sd, f"{prefix}.global_avg_pool.1.weight"))}
    bp, bs = bn_entries(sd, f"{prefix}.global_avg_pool.2")
    p["gp_bn"], s["gp_bn"] = bp, bs
    p["proj_conv"] = {"kernel": conv_kernel(_get(sd, f"{prefix}.conv1.weight"))}
    bp, bs = bn_entries(sd, f"{prefix}.bn1")
    p["proj_bn"], s["proj_bn"] = bp, bs
    return p, s


def import_hanet_conv(sd, prefix="hanet_last", layer=3):
    """HANet_Conv (models_hanet/HANet.py:9-128, is_encoding=1 sinusoid
    default — the learned PosEmbedding1D variant carries its own embedding
    and is imported separately when present) -> models.hanet.HANetConv."""
    p, s = {}, {}
    p["att1_conv"] = {"kernel": conv1d_kernel(
        _get(sd, f"{prefix}.attention_first.0.weight"))}
    bp, bs = bn_entries(sd, f"{prefix}.attention_first.1")
    p["att1_bn"], s["att1_bn"] = bp, bs
    p["att2_conv"] = {
        "kernel": conv1d_kernel(_get(sd, f"{prefix}.attention_second.0.weight")),
        "bias": _get(sd, f"{prefix}.attention_second.0.bias"),
    }
    if layer == 3:
        bp, bs = bn_entries(sd, f"{prefix}.attention_second.1")
        p["att2_bn"], s["att2_bn"] = bp, bs
        p["att3_conv"] = {
            "kernel": conv1d_kernel(
                _get(sd, f"{prefix}.attention_third.0.weight")),
            "bias": _get(sd, f"{prefix}.attention_third.0.bias"),
        }
    emb_key = f"{prefix}.pos_emb1d_2nd.pos_embedding.weight"
    if emb_key in sd:  # PosEmbedding1D (is_encoding=0, PosEmbedding.py:88+)
        p["pos_emb1d_2nd"] = {"embedding": _get(sd, emb_key)}
    return p, s


def import_minidsnet_ext(state_dict, labels=2, use_att=True,
                         conv_deconv_out=0, ablation=(), aspp_mod=0,
                         hanet=False, variant="ext", backbone="densenet"):
    """Convert a torch minidsnetExt state dict (densenet backbone; aspp
    modes 0/1/2 via ``aspp_mod``; optional HANet head via ``hanet`` —
    flagship train-script config is aspp 0, scripts/trainTorchImpl.sh:30-44)
    into MiniDSNetExt {params, batch_stats} trees. ``variant``:
    * 'v2' = minidsnetExt2 (dsnet_t2.py:1632-1890): identical module set
      except the single self-gate conv1d_at replaces conv1d_at_d/at_s.
    * 'piramid' = minidsnetExtPiramid (:1303-1629): identical module set
      to the flagship (only the final skip tensor differs in forward).
    * 'piramid_res' = minidsnetExtPiramidRes (:2180-2423): dispoutConv and
      the head-2 output (convSegOut) are PLAIN conv2dSame (no transpose),
      and Conv2DownUp11 is unwrapped (no Sequential index).

    The four independent 3->1 image convs conv2d_ba{0..3} merge into our
    single 3->4 ConvBN; channel order follows the reference's forward
    binding (dsnet_t2.py:1176-1179): ch0=ba0 (xleft0), ch1=ba2 (xleft1),
    ch2=ba1 (xleft2), ch3=ba3 (unused xleft3).
    """
    sd = state_dict
    params, stats = {}, {}

    params["features"], stats["features"] = import_piramidnet2(
        sd, backbone=backbone)

    # merged image convs
    order = (0, 2, 1, 3)
    ks, scs, bis, mes, vas = [], [], [], [], []
    for i in order:
        ks.append(conv_kernel(_get(sd, f"conv2d_ba{i}.0.layers.0.c2d.weight")))
        scs.append(_get(sd, f"conv2d_ba{i}.0.layers.1.weight"))
        bis.append(_get(sd, f"conv2d_ba{i}.0.layers.1.bias"))
        mes.append(_get(sd, f"conv2d_ba{i}.0.layers.1.running_mean"))
        vas.append(_get(sd, f"conv2d_ba{i}.0.layers.1.running_var"))
    params["conv2d_ba"] = {
        "conv": {"kernel": np.concatenate(ks, axis=-1)},
        "bn": {"scale": np.concatenate(scs), "bias": np.concatenate(bis)},
    }
    stats["conv2d_ba"] = {"bn": {"mean": np.concatenate(mes),
                                 "var": np.concatenate(vas)}}

    # segNet head (dsnet_t2.py:915-938) -> SegNetHead
    seg_p, seg_s = {}, {}
    seg_p["conv1d_1"] = _conv_plain(sd, "segNet.conv1d_1", 64)
    seg_p["cdu1"], seg_s["cdu1"] = _cdu(sd, "segNet.Conv2DownUp1")
    seg_p["conv1d_2"] = _conv_plain(sd, "segNet.conv1d_2", 32)
    seg_p["cdu2"], seg_s["cdu2"] = _cdu(sd, "segNet.Conv2DownUp2.0", last=False)
    seg_p["out"] = _deconv_out(sd, "segNet.Conv2DownUp2.1")
    params["segNet"], stats["segNet"] = seg_p, seg_s

    params["corrConv2d"] = _conv_plain(sd, "corrConv2d", 128)
    params["cdu3"], stats["cdu3"] = _cdu(sd, "Conv2DownUp3")
    params["cdu4"], stats["cdu4"] = _cdu(sd, "Conv2DownUp4")
    params["conv1d_2"] = _conv_plain(sd, "conv1d_2", 64)
    params["cdu5"], stats["cdu5"] = _cdu(sd, "Conv2DownUp5", last=False)
    if variant == "piramid_res":
        # plain conv2dSame head (dsnet_t2.py:2293) — no kernel flip
        params["dispoutConv"] = {"conv": {"kernel": conv_kernel(
            _get(sd, "dispoutConv.c2d.weight"))}}
    else:
        params["dispoutConv"] = _deconv_out(sd, "dispoutConv")
    # conv1d_3 is constructed but never used by minidsnetExt.forward — skip.
    params["conv1d_4"] = _conv_plain(sd, "conv1d_4", 128)
    params["cdu6"], stats["cdu6"] = _cdu(sd, "Conv2DownUp6")
    if "no_dec3" not in ablation:
        if variant == "v2":
            params["cdu7"], stats["cdu7"] = _cdu(sd, "Conv2DownUp7")
            params["cdu9"], stats["cdu9"] = _cdu(sd, "Conv2DownUp9")
            params["conv1d_at"] = _conv_plain(sd, "conv1d_at", 1)
        elif use_att:
            params["cdu7"], stats["cdu7"] = _cdu(sd, "Conv2DownUp7")
            params["cdu9"], stats["cdu9"] = _cdu(sd, "Conv2DownUp9")
            params["conv1d_at_d"] = _conv_plain(sd, "conv1d_at_d", 1)
            params["conv1d_at_s"] = _conv_plain(sd, "conv1d_at_s", 1)
        params["cdu8"], stats["cdu8"] = _cdu(sd, "Conv2DownUp8")
    params["cdu10"], stats["cdu10"] = _cdu(sd, "Conv2DownUp10")
    params["conv1d_5"] = _conv_plain(sd, "conv1d_5", 32)
    if aspp_mod in (1, 2):
        params["aspp"], stats["aspp"] = import_aspp_dsnet(sd)
    if backbone in ("resnet50", "resnet101"):
        # resnet trunks add an ASPP over the deepest tap (aspp_4,
        # dsnet_t2.py:957-960); only constructed at aspp 0 in the reference
        params["aspp_4"], stats["aspp_4"] = import_aspp_dsnet(
            sd, prefix="aspp_4")
    if hanet:
        params["hanet_last"], stats["hanet_last"] = import_hanet_conv(sd)
    if conv_deconv_out:
        params["cdu11"], stats["cdu11"] = _cdu(sd, "Conv2DownUp11.0",
                                               last=False)
        w = conv_kernel(_get(sd, "convOutput2.c2d.weight"))
        params["convOutput2"] = {"kernel": w}
        if conv_deconv_out == 2:
            params["convOutput"] = _deconv_out(sd, "convOutput")
    elif variant == "piramid_res":
        params["cdu11"], stats["cdu11"] = _cdu(sd, "Conv2DownUp11",
                                               last=False)
        params["cdu11_out"] = {"conv": {"kernel": conv_kernel(
            _get(sd, "convSegOut.c2d.weight"))}}
    else:
        params["cdu11"], stats["cdu11"] = _cdu(sd, "Conv2DownUp11.0",
                                               last=False)
        params["cdu11_out"] = _deconv_out(sd, "Conv2DownUp11.1")
    return params, stats


def import_minidsnet(state_dict, labels=2):
    """minidsnet 'sdnet_mini' (dsnet_t2.py:825-912) -> MiniDSNet {params,
    batch_stats}. Uses the ORIGINAL piramidNet (:324-397): 5 branch0 convs
    on tap0 + 3 'branch1' convs on tap2. conv2d_ba2/ba3 and conv1d_3 are
    constructed but unused by forward — skipped. The two used image convs
    ba0/ba1 merge into our single 3->2 ConvBN (channel order ba0, ba1)."""
    sd = state_dict
    params, stats = {}, {}
    params["features"], stats["features"] = import_piramidnet2(
        sd, branches=((0, 5), (1, 3)))

    ks, scs, bis, mes, vas = [], [], [], [], []
    for i in (0, 1):
        ks.append(conv_kernel(_get(sd, f"conv2d_ba{i}.0.layers.0.c2d.weight")))
        scs.append(_get(sd, f"conv2d_ba{i}.0.layers.1.weight"))
        bis.append(_get(sd, f"conv2d_ba{i}.0.layers.1.bias"))
        mes.append(_get(sd, f"conv2d_ba{i}.0.layers.1.running_mean"))
        vas.append(_get(sd, f"conv2d_ba{i}.0.layers.1.running_var"))
    params["conv2d_ba"] = {
        "conv": {"kernel": np.concatenate(ks, axis=-1)},
        "bn": {"scale": np.concatenate(scs), "bias": np.concatenate(bis)},
    }
    stats["conv2d_ba"] = {"bn": {"mean": np.concatenate(mes),
                                 "var": np.concatenate(vas)}}

    seg_p, seg_s = {}, {}
    seg_p["conv1d_1"] = _conv_plain(sd, "segNet.conv1d_1", 64)
    seg_p["cdu1"], seg_s["cdu1"] = _cdu(sd, "segNet.Conv2DownUp1")
    seg_p["conv1d_2"] = _conv_plain(sd, "segNet.conv1d_2", 32)
    seg_p["cdu2"], seg_s["cdu2"] = _cdu(sd, "segNet.Conv2DownUp2.0",
                                        last=False)
    seg_p["out"] = _deconv_out(sd, "segNet.Conv2DownUp2.1")
    params["segNet"], stats["segNet"] = seg_p, seg_s

    params["corrConv2d"] = _conv_plain(sd, "corrConv2d", 128)
    params["cdu3"], stats["cdu3"] = _cdu(sd, "Conv2DownUp3")
    params["cdu4"], stats["cdu4"] = _cdu(sd, "Conv2DownUp4")
    params["conv1d_2"] = _conv_plain(sd, "conv1d_2", 64)
    params["cdu5"], stats["cdu5"] = _cdu(sd, "Conv2DownUp5", last=False)
    params["dispoutConv"] = _deconv_out(sd, "dispoutConv")
    return params, stats


def import_seg_dsnet(state_dict, labels=2):
    """seg_dsnet 'sdnet_seg' (dsnet_t2.py:2087-2177) -> SegDSNet {params,
    batch_stats}: minidsnet's trunk with a SHARED per-view segNet over the
    deepest tap (in 1024) and the shared conv2d_ba0 skip. conv2d_ba2/ba3
    and conv1d_3 unused by forward — skipped."""
    sd = state_dict
    params, stats = {}, {}
    params["features"], stats["features"] = import_piramidnet2(
        sd, branches=((0, 5), (1, 3)))
    for name in ("conv2d_ba0", "conv2d_ba1"):
        cp, cs = _convbn(sd, f"{name}.0")
        params[name], stats[name] = cp, cs

    seg_p, seg_s = {}, {}
    seg_p["conv1d_1"] = _conv_plain(sd, "segNet.conv1d_1", 64)
    seg_p["cdu1"], seg_s["cdu1"] = _cdu(sd, "segNet.Conv2DownUp1")
    seg_p["conv1d_2"] = _conv_plain(sd, "segNet.conv1d_2", 32)
    seg_p["cdu2"], seg_s["cdu2"] = _cdu(sd, "segNet.Conv2DownUp2.0",
                                        last=False)
    seg_p["out"] = _deconv_out(sd, "segNet.Conv2DownUp2.1")
    params["segNet"], stats["segNet"] = seg_p, seg_s

    params["corrConv2d"] = _conv_plain(sd, "corrConv2d", 128)
    params["cdu3"], stats["cdu3"] = _cdu(sd, "Conv2DownUp3")
    params["cdu4"], stats["cdu4"] = _cdu(sd, "Conv2DownUp4")
    params["conv1d_2"] = _conv_plain(sd, "conv1d_2", 64)
    params["cdu5"], stats["cdu5"] = _cdu(sd, "Conv2DownUp5", last=False)
    params["dispoutConv"] = _deconv_out(sd, "dispoutConv")
    return params, stats


def _convbn_single(sd, prefix):
    """conv2d_ba-style Sequential(convbn, ReLU) -> ConvBN (with BN)."""
    return _convbn(sd, f"{prefix}.0")


def _deconvbn_stride2(sd, prefix):
    """conv2DT_BA Sequential(deconvbn stride-2, ReLU) -> DeconvBN stride 2.
    flax ConvTranspose correlates (no kernel flip), torch ConvTranspose2d
    convolves -> flip spatial dims; layout (I,O,kh,kw) -> (kh,kw,I,O)."""
    w = _get(sd, f"{prefix}.0.layers.0.ct2d.weight")
    k = np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))
    p, s = bn_entries(sd, f"{prefix}.0.layers.1")
    return {"deconv": {"kernel": k}, "bn": p}, {"bn": s}


def import_dsnet(state_dict, labels=2):
    """dsnet 'sdnet' (dsnet_t2.py:119-321) -> DSNet {params, batch_stats}:
    dsnetv2's cascade with the head-1 decoder inlined at top level (no
    segNet helper) and no conv2d_ba0. conv1d_7 unused by forward — skip."""
    sd = state_dict
    params, stats = {}, {}
    params["features"], stats["features"] = import_piramidnet2(
        sd, branches=((0, 5), (1, 3)))
    for i in (1, 2, 3):
        p, s = _convbn(sd, f"conv2d_ba{i}.0")
        params[f"conv2d_ba{i}"], stats[f"conv2d_ba{i}"] = p, s

    params["conv1d_1"] = _conv_plain(sd, "conv1d_1", 64)
    params["cdu1"], stats["cdu1"] = _cdu(sd, "Conv2DownUp1")
    params["cdu2"], stats["cdu2"] = _cdu(sd, "Conv2DownUp2.0", last=False)
    params["cdu2_out"] = _deconv_out(sd, "Conv2DownUp2.1")

    params["corrConv2d"] = _conv_plain(sd, "corrConv2d", 128)
    params["cdu3"], stats["cdu3"] = _cdu(sd, "Conv2DownUp3")
    params["cdu4"], stats["cdu4"] = _cdu(sd, "Conv2DownUp4")
    params["conv1d_2"] = _conv_plain(sd, "conv1d_2", 64)
    params["cdu5"], stats["cdu5"] = _cdu(sd, "Conv2DownUp5", last=False)
    params["dispoutConv"] = _deconv_out(sd, "dispoutConv")
    params["conv1d_3"] = _conv_plain(sd, "conv1d_3", 64)
    params["cdu6"], stats["cdu6"] = _cdu(sd, "Conv2DownUp6")
    params["conv1d_4"] = _conv_plain(sd, "conv1d_4", 64)
    params["deconv_ba1"], stats["deconv_ba1"] = _deconvbn_stride2(
        sd, "conv2DT_BA1")
    params["conv1d_5"] = _conv_plain(sd, "conv1d_5", 32)
    params["deconv_ba2"], stats["deconv_ba2"] = _deconvbn_stride2(
        sd, "conv2DT_BA2")
    params["conv1d_6"] = _conv_plain(sd, "conv1d_6", 32)
    params["cdu7"], stats["cdu7"] = _cdu(sd, "Conv2DownUp7", last=False)
    params["branchConv"] = _deconv_out(sd, "branchConv")
    params["conv1d_9"] = _conv_plain(sd, "conv1d_9", 128)
    params["cdu8"], stats["cdu8"] = _cdu(sd, "Conv2DownUp8")
    params["cdu9"], stats["cdu9"] = _cdu(sd, "Conv2DownUp9")
    params["conv1d_8"] = _conv_plain(sd, "conv1d_8", 64)
    params["cdu10"], stats["cdu10"] = _cdu(sd, "Conv2DownUp10.0", last=False)
    params["cdu10_out"] = _deconv_out(sd, "Conv2DownUp10.1")
    return params, stats


def import_dsnetv2(state_dict, labels=2):
    """Convert a torch dsnetv2 state dict (dsnet_t2.py:402-616) into our
    DSNetV2 {params, batch_stats} trees (models/sdnet_legacy.py)."""
    sd = state_dict
    params, stats = {}, {}

    params["features"], stats["features"] = import_piramidnet2(
        sd, branches=((0, 5), (1, 3))
    )
    for i in range(4):
        p, s = _convbn_single(sd, f"conv2d_ba{i}")
        params[f"conv2d_ba{i}"], stats[f"conv2d_ba{i}"] = p, s

    seg_p, seg_s = {}, {}
    seg_p["conv1d_1"] = _conv_plain(sd, "segNet.conv1d_1", 64)
    seg_p["cdu1"], seg_s["cdu1"] = _cdu(sd, "segNet.Conv2DownUp1")
    seg_p["conv1d_2"] = _conv_plain(sd, "segNet.conv1d_2", 32)
    seg_p["cdu2"], seg_s["cdu2"] = _cdu(sd, "segNet.Conv2DownUp2.0", last=False)
    seg_p["out"] = _deconv_out(sd, "segNet.Conv2DownUp2.1")
    params["segNet"], stats["segNet"] = seg_p, seg_s

    params["corrConv2d"] = _conv_plain(sd, "corrConv2d", 128)
    params["cdu3"], stats["cdu3"] = _cdu(sd, "Conv2DownUp3")
    params["cdu4"], stats["cdu4"] = _cdu(sd, "Conv2DownUp4")
    params["conv1d_2"] = _conv_plain(sd, "conv1d_2", 64)
    params["cdu5"], stats["cdu5"] = _cdu(sd, "Conv2DownUp5", last=False)
    params["dispoutConv"] = _deconv_out(sd, "dispoutConv")
    params["conv1d_3"] = _conv_plain(sd, "conv1d_3", 64)
    params["cdu6"], stats["cdu6"] = _cdu(sd, "Conv2DownUp6")
    params["conv1d_4"] = _conv_plain(sd, "conv1d_4", 64)
    params["deconv_ba1"], stats["deconv_ba1"] = _deconvbn_stride2(
        sd, "conv2DT_BA1")
    params["conv1d_5"] = _conv_plain(sd, "conv1d_5", 32)
    params["deconv_ba2"], stats["deconv_ba2"] = _deconvbn_stride2(
        sd, "conv2DT_BA2")
    params["conv1d_6"] = _conv_plain(sd, "conv1d_6", 32)
    params["cdu7"], stats["cdu7"] = _cdu(sd, "Conv2DownUp7", last=False)
    params["branchConv"] = _deconv_out(sd, "branchConv")
    params["conv1d_9"] = _conv_plain(sd, "conv1d_9", 128)
    # conv1d_7 is constructed but never used by dsnetv2.forward — skip.
    params["cdu8"], stats["cdu8"] = _cdu(sd, "Conv2DownUp8")
    params["cdu9"], stats["cdu9"] = _cdu(sd, "Conv2DownUp9")
    params["conv1d_8"] = _conv_plain(sd, "conv1d_8", 64)
    params["cdu10"], stats["cdu10"] = _cdu(sd, "Conv2DownUp10.0", last=False)
    params["cdu10_out"] = _deconv_out(sd, "Conv2DownUp10.1")
    return params, stats
