#!/usr/bin/env python
"""Measure the PyTorch reference's flagship forward throughput.

The reference publishes no throughput (SURVEY.md §6) and this environment
has no CUDA, so the only directly runnable baseline is torch-CPU. We shim
the two unavailable CUDA-era deps (spatial_correlation_sampler — replaced by
an equivalent unfold-based torch implementation — and efficientnet_pytorch)
and time minidsnetExt(densenet121, 1dcorr) at 512x960.

Writes BASELINE_MEASURED.json consumed by bench.py's vs_baseline.
"""
import json
import os
import sys
import time
import types

import numpy as np
import torch
import torch.nn.functional as F


def install_shims():
    # --- spatial_correlation_sampler shim (same semantics: kernel 1,
    # patch (ph,pw), stride 1, pad 0, dilation 1) ---
    class SpatialCorrelationSampler(torch.nn.Module):
        def __init__(self, kernel_size=1, patch_size=(1, 17), stride=1,
                     padding=0, dilation_patch=1):
            super().__init__()
            if isinstance(patch_size, int):
                patch_size = (patch_size, patch_size)
            self.patch = patch_size

        def forward(self, a, b):
            ph, pw = self.patch
            rh, rw = ph // 2, pw // 2
            n, c, h, w = a.shape
            bp = F.pad(b, (rw, rw, rh, rh))
            out = a.new_zeros((n, ph, pw, h, w))
            for i in range(ph):
                for j in range(pw):
                    out[:, i, j] = (a * bp[:, :, i : i + h, j : j + w]).sum(1)
            return out

    m = types.ModuleType("spatial_correlation_sampler")
    m.SpatialCorrelationSampler = SpatialCorrelationSampler
    sys.modules["spatial_correlation_sampler"] = m

    # --- efficientnet_pytorch stub (only imported, not used by densenet path)
    e = types.ModuleType("efficientnet_pytorch")

    class _EffNet:
        @staticmethod
        def from_pretrained(name):
            raise RuntimeError("efficientnet weights unavailable offline")

    e.EfficientNet = _EffNet
    sys.modules["efficientnet_pytorch"] = e

    # --- torchvision stub (imported by models/torch_model.py; the datasets/
    # models/transforms symbols are unused on the densenet path) ---
    tv = types.ModuleType("torchvision")
    tv.datasets = types.ModuleType("torchvision.datasets")
    tv.models = types.ModuleType("torchvision.models")
    tv.transforms = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvf.pad = F.pad
    tv.transforms.functional = tvf
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = tv.datasets
    sys.modules["torchvision.models"] = tv.models
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.transforms.functional"] = tvf

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def main():
    h, w, batch, iters = 512, 960, 1, 3
    torch.set_num_threads(os.cpu_count() or 1)
    install_shims()
    sys.path.insert(0, "/root/reference")
    from types import SimpleNamespace

    from models import dsnet_t2

    cfg = SimpleNamespace(
        dropout=0.0, multaskloss=0, aspp=0, use_att=1, hanet=0,
        convDeconvOut=0, abilation="",
    )
    net = dsnet_t2.minidsnetExt(
        cfg, labels=2, pretrained=False, patch_type="1dcorr",
        include_edges=False, backbone="densenet",
    )
    net.eval()
    left = torch.randn(batch, 3, h, w)
    right = torch.randn(batch, 3, h, w)
    with torch.no_grad():
        net(left, right)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            net(left, right)
        dt = time.perf_counter() - t0
    pps = batch * iters / dt
    out = {
        "torch_cpu_pairs_per_sec": pps,
        "note": (
            "torch reference (minidsnetExt, densenet121, 1dcorr) forward at "
            "512x960, CPU-only environment (no CUDA available); "
            f"{iters} iters batch {batch}"
        ),
        "threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "BASELINE_MEASURED.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
