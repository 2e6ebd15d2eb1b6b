"""Import the (read-only) torch reference as a CPU test oracle.

We patch .cuda() to a no-op so the reference loss code runs on CPU. This is
used ONLY to verify numerical parity in tests; no reference code ships in the
package.
"""
import sys

REF = "/root/reference"


def load_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    # neutralize .cuda() so reference loss code runs on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    return True


def load_reference_models():
    """Import models/dsnet_t2.py with its CUDA-era deps shimmed:
    spatial_correlation_sampler (unfold-equivalent torch implementation),
    efficientnet_pytorch and torchvision (stubs — unused on the densenet
    path). Returns the dsnet_t2 module. Used ONLY as a CPU numerical
    oracle for activation-level parity tests."""
    import types

    load_reference()
    import torch
    import torch.nn.functional as F

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
                    out[:, i, j] = (a * bp[:, :, i: i + h, j: j + w]).sum(1)
            return out

    m = types.ModuleType("spatial_correlation_sampler")
    m.SpatialCorrelationSampler = SpatialCorrelationSampler
    sys.modules.setdefault("spatial_correlation_sampler", m)

    e = types.ModuleType("efficientnet_pytorch")

    class _EffNet:
        @staticmethod
        def from_pretrained(name):
            raise RuntimeError("efficientnet weights unavailable offline")

    e.EfficientNet = _EffNet
    sys.modules.setdefault("efficientnet_pytorch", e)

    if "torchvision" not in sys.modules:
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

    from models import dsnet_t2  # noqa: E402

    # apply_disparity hardcodes tensor_type='torch.cuda.FloatTensor'
    # (torch_dsnet.py:10) — retarget the default so the warp family runs
    # on CPU; dsnet_t2_warp binds the same function object.
    from models import torch_dsnet  # noqa: E402

    torch_dsnet.apply_disparity.__defaults__ = tuple(
        "torch.FloatTensor" if d == "torch.cuda.FloatTensor" else d
        for d in torch_dsnet.apply_disparity.__defaults__
    )

    return dsnet_t2
