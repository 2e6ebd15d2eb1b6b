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
