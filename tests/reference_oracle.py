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
    # independent torch implementation of the package's architecture with
    # identical state-dict keys (tests/effnet_oracle.py); from_pretrained
    # falls back to random init (no downloads in this image)
    from effnet_oracle import EfficientNet as _EffNet

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
    _install_tv_resnet_stub()

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


def _install_tv_resnet_stub():
    """torchvision is not installed here; models_deeplab/encoder.py needs
    torchvision.models.resnet{18,34,50,...} plus the BasicBlock/Bottleneck
    classes it isinstance-checks. This stub reproduces torchvision's resnet
    module exactly (param names, shapes, forward) with pretrained ignored —
    the reference ALWAYS requests pretrained weights there because
    net.py:26 passes `pretrained` positionally into create_encoder's
    output_stride slot (a reference bug); offline random init is the only
    option and weight-transport parity is init-agnostic anyway."""
    import sys
    import types

    import torch
    import torch.nn as nn

    tvm = sys.modules.get("torchvision.models")
    if tvm is None or hasattr(tvm, "resnet"):
        return

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], 2)
            self.layer3 = self._make_layer(block, 256, layers[2], 2)
            self.layer4 = self._make_layer(block, 512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)

        def _make_layer(self, block, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                              stride, bias=False),
                    nn.BatchNorm2d(planes * block.expansion),
                )
            layers = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes))
            return nn.Sequential(*layers)

    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.BasicBlock = BasicBlock
    resnet_mod.Bottleneck = Bottleneck
    resnet_mod.ResNet = ResNet
    cfgs = {"resnet18": (BasicBlock, (2, 2, 2, 2)),
            "resnet34": (BasicBlock, (3, 4, 6, 3)),
            "resnet50": (Bottleneck, (3, 4, 6, 3)),
            "resnet101": (Bottleneck, (3, 4, 23, 3)),
            "resnet152": (Bottleneck, (3, 8, 36, 3))}
    for name, (blk, lay) in cfgs.items():
        def factory(pretrained=False, _blk=blk, _lay=lay, **kw):
            del pretrained  # no weights offline; random init
            return ResNet(_blk, list(_lay))
        setattr(resnet_mod, name, factory)
        setattr(tvm, name, factory)
    tvm.resnet = resnet_mod
    sys.modules["torchvision.models.resnet"] = resnet_mod
