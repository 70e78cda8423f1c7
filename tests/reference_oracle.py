"""Load the reference (PyTorch) Model_geometry as a numerical oracle.

The environment lacks torchvision, which the reference's depth model imports
(/root/reference/core/networks/structures/depth_model.py:12), so a minimal
stub providing the standard torchvision ResNet-18 surface (conv1/bn1/layer1-4
naming, BasicBlock residuals) is installed into sys.modules first. The stub
is written from the well-known public ResNet architecture -- it only needs to
reproduce torchvision's module NAMES and forward semantics for the pieces the
reference's ResnetEncoder touches (depth_model.py:85-95).
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn


class _BasicBlock(nn.Module):
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
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    """Standard-naming ResNet trunk (no classifier head -- the reference's
    encoder never calls avgpool/fc, depth_model.py:85-95)."""

    def __init__(self, block, layers, num_classes=1000, **kw):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)


def _resnet18(pretrained=False, **kw):
    assert not pretrained, "stub has no pretrained weights"
    return _ResNet(_BasicBlock, [2, 2, 2, 2])


def _unavailable(*a, **kw):
    raise NotImplementedError("torchvision stub: only resnet18 is provided")


def install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    resnet = types.ModuleType("torchvision.models.resnet")
    resnet.BasicBlock = _BasicBlock
    resnet.Bottleneck = None
    resnet.model_urls = {}
    models.ResNet = _ResNet
    models.resnet = resnet
    models.resnet18 = _resnet18
    for name in ("resnet34", "resnet50", "resnet101", "resnet152"):
        setattr(models, name, _unavailable)
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.resnet"] = resnet


def load_reference_model_geometry():
    """Import the reference's Model_geometry class (torch CPU).

    The reference assumes CUDA: it calls ``t.to(x.get_device())`` throughout
    (net_utils.py:48, model_geometry.py:447,885...), which raises on CPU where
    get_device() is -1. For the CPU oracle we patch get_device to return
    "cpu" -- ``.to("cpu")`` is then a no-op, preserving semantics exactly.
    """
    install_torchvision_stub()
    torch.Tensor.get_device = lambda self: "cpu"
    ref_dir = "/root/reference/core/networks"
    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    import model_geometry  # noqa: E402  (reference module, resolved via ref_dir)

    return model_geometry.Model_geometry


def load_reference_model_flow():
    """Import the reference's Model_flow class (torch CPU) with its two
    publication defects patched IN-TEST (survey defects 1-2):

    - defect 1 (``cfg.h_flow_consist_alpha/beta`` vs configs' plain names)
      is handled by the caller providing the ``h_``-prefixed attributes;
    - defect 2 (``forward`` reads an undefined bare name ``output_flow``,
      model_flow.py:258) is patched by injecting a module-global
      ``output_flow = False`` so the forward returns just ``loss_pack`` --
      byte-identical semantics to the intended keyword argument.

    defect 3 (``transformerFwd`` undefined) lives only in
    ``get_occlusion_mask_from_flow``, which the forward path never calls.
    """
    install_torchvision_stub()
    torch.Tensor.get_device = lambda self: "cpu"
    ref_dir = "/root/reference/core/networks"
    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    import model_flow  # noqa: E402  (reference module, resolved via ref_dir)

    model_flow.output_flow = False
    return model_flow.Model_flow


def reference_state_dict_numpy(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
