"""Flax network modules."""

from .depth_net import DepthDecoder, DepthNet, ResNet18Encoder
from .feature_pyramid import FeaturePyramid
from .flowpose_net import FlowPoseNet
from .joint import JointModel, split_stack
from .pose_net import PoseNet
from .pwc_decoder import PWCDecoder

__all__ = [
    "DepthDecoder",
    "DepthNet",
    "ResNet18Encoder",
    "FeaturePyramid",
    "FlowPoseNet",
    "JointModel",
    "split_stack",
    "PoseNet",
    "PWCDecoder",
]
