"""Import reference (PyTorch) Model_geometry checkpoints into flax variables.

Maps a state_dict of the reference joint model
(/root/reference/core/networks/model_geometry.py:29-32 -- Depth_Model +
PoseCNN + FeaturePyramid + PWC_tf) onto this package's ``JointModel``
parameter/batch_stats pytrees. This gives users of the reference a direct
migration path for trained weights, and powers the whole-model numerical
parity test (tests/test_parity_golden.py).

Layout conventions translated:
- torch Conv2d weight [O, I, kh, kw]  ->  flax kernel [kh, kw, I, O]
- torch Linear weight [O, I]          ->  flax Dense kernel [I, O]
- torch BatchNorm weight/bias/running_mean/running_var
    -> flax BatchNorm scale/bias (params) + mean/var (batch_stats)

The state_dict may come straight from ``torch.load(...)['model_state_dict']``
(values must be numpy arrays or anything np.asarray accepts; strip any
``module.`` DataParallel prefix first with :func:`strip_module_prefix`).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def strip_module_prefix(state_dict: Mapping) -> Dict[str, np.ndarray]:
    """Remove torch DataParallel's ``module.`` name prefix."""
    out = {}
    for k, v in state_dict.items():
        out[k[len("module.") :] if k.startswith("module.") else k] = v
    return out


def _conv_w(v) -> np.ndarray:
    return np.transpose(np.asarray(v, np.float32), (2, 3, 1, 0))


def _lin_w(v) -> np.ndarray:
    return np.transpose(np.asarray(v, np.float32), (1, 0))


def _f32(v) -> np.ndarray:
    return np.asarray(v, np.float32)


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


class _Mapper:
    def __init__(self, sd: Mapping):
        self.sd = dict(sd)
        self.params: dict = {}
        self.stats: dict = {}
        self.used: set = set()

    def conv(self, torch_name: str, flax_path: str, bias: bool = True) -> None:
        _set(self.params, flax_path + "/kernel", _conv_w(self.sd[torch_name + ".weight"]))
        self.used.add(torch_name + ".weight")
        if bias:
            _set(self.params, flax_path + "/bias", _f32(self.sd[torch_name + ".bias"]))
            self.used.add(torch_name + ".bias")

    def linear(self, torch_name: str, flax_path: str) -> None:
        _set(self.params, flax_path + "/kernel", _lin_w(self.sd[torch_name + ".weight"]))
        _set(self.params, flax_path + "/bias", _f32(self.sd[torch_name + ".bias"]))
        self.used.update({torch_name + ".weight", torch_name + ".bias"})

    def bn(self, torch_name: str, flax_path: str) -> None:
        _set(self.params, flax_path + "/scale", _f32(self.sd[torch_name + ".weight"]))
        _set(self.params, flax_path + "/bias", _f32(self.sd[torch_name + ".bias"]))
        _set(self.stats, flax_path + "/mean", _f32(self.sd[torch_name + ".running_mean"]))
        _set(self.stats, flax_path + "/var", _f32(self.sd[torch_name + ".running_var"]))
        self.used.update(
            {
                torch_name + ".weight",
                torch_name + ".bias",
                torch_name + ".running_mean",
                torch_name + ".running_var",
            }
        )


def _port_flow_nets(m: "_Mapper") -> None:
    """fpyramid + PWC decoder mappings (shared by Model_geometry/Model_flow)."""
    # ---------------- feature pyramid (feature_pyramid.py:10-21) ----------
    for i in range(12):
        m.conv(f"fpyramid.conv{i + 1}.0", f"fpyramid/ConvLReLU_{i}/Conv_0")

    # ---------------- PWC decoder (pwc_tf.py:26-88) ------------------------
    # torch level order conv6..conv2 == flax DenseFlowBlock_0..4
    for blk, lvl in enumerate((6, 5, 4, 3, 2)):
        for j in range(5):
            m.conv(
                f"pwc_model.conv{lvl}_{j}.0",
                f"pwc/DenseFlowBlock_{blk}/ConvLReLU_{j}/Conv_0",
            )
        m.conv(f"pwc_model.predict_flow{lvl}", f"pwc/DenseFlowBlock_{blk}/Conv_0/Conv_0")
    for j in range(6):
        m.conv(f"pwc_model.dc_conv{j + 1}.0", f"pwc/ContextNet_0/ConvLReLU_{j}/Conv_0")
    m.conv("pwc_model.dc_conv7", "pwc/ContextNet_0/Conv_0/Conv_0")


def port_model_flow(state_dict: Mapping) -> dict:
    """Reference Model_flow state_dict -> {'params': ...} (fpyramid + PWC).

    The flow-only model has no BN anywhere, so batch_stats is empty.
    """
    m = _Mapper(state_dict)
    _port_flow_nets(m)
    unused = {
        k for k in m.sd if k not in m.used and not k.endswith("num_batches_tracked")
    }
    if unused:
        raise ValueError(f"unmapped reference parameters: {sorted(unused)[:8]}...")
    return {"params": m.params, "batch_stats": m.stats}


def port_model_geometry(state_dict: Mapping, num_scales: int = 3) -> dict:
    """Reference Model_geometry state_dict -> {'params': ..., 'batch_stats': ...}.

    Covers all four sub-networks. Raises KeyError on missing entries so a
    partial/mismatched checkpoint fails loudly.
    """
    m = _Mapper(state_dict)

    _port_flow_nets(m)

    # ---------------- pose net (pose_cnn.py:20-49) -------------------------
    for i in range(7):
        m.conv(f"pose_net.net.{i}", f"pose_net/Conv_{i}/Conv_0")
    m.conv("pose_net.pose_conv", "pose_net/Conv_7/Conv_0")
    for i in range(4):
        m.conv(f"pose_net.refine_net.{i}", f"pose_net/Conv_{8 + i}/Conv_0")
    m.conv("pose_net.refine_pose_conv", "pose_net/Conv_12/Conv_0")
    for name in ("query_fc", "key_fc", "value_fc"):
        m.linear(f"pose_net.{name}", f"pose_net/{name}")

    # ---------------- depth encoder (torchvision resnet18 naming) ----------
    enc = "depth_net.encoder.encoder"
    m.conv(f"{enc}.conv1", "depth_net/ResNet18Encoder_0/Conv_0", bias=False)
    m.bn(f"{enc}.bn1", "depth_net/ResNet18Encoder_0/BatchNorm_0")
    blk = 0
    for layer in range(1, 5):
        for sub in range(2):
            t = f"{enc}.layer{layer}.{sub}"
            f = f"depth_net/ResNet18Encoder_0/BasicBlock_{blk}"
            m.conv(f"{t}.conv1", f"{f}/Conv_0", bias=False)
            m.bn(f"{t}.bn1", f"{f}/BatchNorm_0")
            m.conv(f"{t}.conv2", f"{f}/Conv_1", bias=False)
            m.bn(f"{t}.bn2", f"{f}/BatchNorm_1")
            if f"{t}.downsample.0.weight" in m.sd:
                m.conv(f"{t}.downsample.0", f"{f}/Conv_2", bias=False)
                m.bn(f"{t}.downsample.1", f"{f}/BatchNorm_2")
            blk += 1

    # ---------------- depth decoder (depth_model.py:135-191) ---------------
    # torch upconvs[i] i=0..4 corresponds to scale 4-i; flax ConvBlock_{2i+j}
    for i in range(5):
        for j in range(2):
            m.conv(
                f"depth_net.decoder.upconvs.{i}.{j}.conv.conv",
                f"depth_net/DepthDecoder_0/ConvBlock_{2 * i + j}/ReflectConv3x3_0/Conv_0",
            )
    # dispconvs[s] for s in range(num_scales); flax heads are created coarse
    # to fine: ReflectConv3x3_k == dispconvs[num_scales - 1 - k]
    for k in range(num_scales):
        m.conv(
            f"depth_net.decoder.dispconvs.{num_scales - 1 - k}.conv",
            f"depth_net/DepthDecoder_0/ReflectConv3x3_{k}/Conv_0",
        )

    unused = {
        k
        for k in m.sd
        if k not in m.used and not k.endswith("num_batches_tracked")
    }
    if unused:
        raise ValueError(f"unmapped reference parameters: {sorted(unused)[:8]}...")
    return {"params": m.params, "batch_stats": m.stats}
