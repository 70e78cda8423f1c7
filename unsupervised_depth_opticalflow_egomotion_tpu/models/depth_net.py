"""Monodepth2-style depth network: ResNet-18 encoder + skip decoder (NHWC).

Re-design of /root/reference/core/networks/structures/depth_model.py for TPU:
- trained-from-scratch ResNet18 (the reference uses pretrained=False,
  depth_model.py:197) with BatchNorm; under pjit the batch statistics are
  computed over the globally sharded batch, which generalizes the reference's
  single-process DataParallel BN.
- decoder: reflection-padded 3x3 convs + ELU, x2 bilinear upsampling, skip
  connections, sigmoid disparity heads at ``num_scales`` scales
  (depth_model.py:135-191).
- input normalization (x - 0.45) / 0.225 (depth_model.py:87).

The forward returns the raw sigmoid "disp" list; NOTE the training graph uses
these directly as depth in inverse_warp2 (model_geometry.py:798-801) -- a
reference behaviour we preserve deliberately (eval inverts consistently).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.int8_conv import int8_conv
from ..ops.interp import upsample2x_bilinear
from ..ops.packed_conv import (
    depth_to_space,
    depth_to_space_rect,
    packed_conv_rect,
    packed_stem_conv,
    packed_upsample2x_bilinear_24,
    repack_22_to_24,
    space_to_depth,
    space_to_depth_rect,
)
from .layers import (
    PackedBatchNorm,
    ReflectConv3x3,
    _ConvParams,
    kaiming_normal_out,
    max_pool_3x3_s2_p1,
)

_DEC_CH = (16, 32, 64, 128, 256)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    # (fy, fx) space-to-depth packing: the block then takes and returns a
    # packed tensor. Only the stride-1, no-downsample shape is supported
    # (= the layer-1 segment, the only lane-starved one). Param names are
    # pinned to the unpacked tree (Conv_0/Conv_1, BatchNorm_0/BatchNorm_1).
    packed: tuple[int, int] | None = None
    # int8 forward for the convs (ops/int8_conv.py: dynamic-range quant +
    # STE backward). Param tree pinned to the unpacked nn.Conv naming so
    # checkpoints move freely between precisions.
    int8: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.packed is not None:
            return self._packed_call(x, train)

        def bn():
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )

        def conv(features, stride, x, kernel=3, name=None):
            if self.int8:
                k, _ = _ConvParams(
                    features,
                    x.shape[-1],
                    kernel=kernel,
                    use_bias=False,
                    kernel_init=kaiming_normal_out,
                    name=name,
                )()
                p = (kernel - 1) // 2
                return int8_conv(
                    x.astype(self.dtype), k, (stride, stride), ((p, p), (p, p))
                )
            return nn.Conv(
                features,
                (kernel, kernel),
                strides=(stride, stride),
                padding=(((kernel - 1) // 2,) * 2,) * 2,
                use_bias=False,
                kernel_init=kaiming_normal_out,
                dtype=self.dtype,
                name=name,
            )(x)

        residual = x
        y = conv(self.features, self.stride, x, name="Conv_0")
        y = bn()(y)
        y = nn.relu(y)
        y = conv(self.features, 1, y, name="Conv_1")
        y = bn()(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = conv(self.features, self.stride, x, kernel=1, name="Conv_2")
            residual = bn()(residual)
        return nn.relu(y + residual)

    def _packed_call(self, xp, train: bool):
        fy, fx = self.packed
        phases = fy * fx
        assert self.stride == 1 and xp.shape[-1] == phases * self.features, (
            "packed BasicBlock supports only the stride-1 identity-residual "
            f"shape; got stride={self.stride}, packed input {xp.shape}"
        )

        def bn(name):
            return PackedBatchNorm(
                use_running_average=not train,
                phases=phases,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=name,
            )

        def conv(name, x):
            k, _ = _ConvParams(
                self.features,
                self.features,
                use_bias=False,
                kernel_init=kaiming_normal_out,
                name=name,
            )()
            return packed_conv_rect(x, k.astype(self.dtype), None, fy, fx)

        y = conv("Conv_0", xp)
        y = bn("BatchNorm_0")(y)
        y = nn.relu(y)
        y = conv("Conv_1", y)
        y = bn("BatchNorm_1")(y)
        return nn.relu(y + xp)


class ResNet18Encoder(nn.Module):
    """Returns the 5 monodepth2 skip features (depth_model.py:85-95).

    ``packed_layer1`` runs the two 64-channel stride-1 blocks (the only
    lane-starved encoder segment: C=64 fills half the 128 lanes) on a
    (1,2) width-packed layout -- 2x MAC redundancy for full lane occupancy,
    with exact packed BatchNorm (PackedBatchNorm). Parameter and stat trees
    are identical in both modes.
    """

    packed_layer1: bool = False
    packed_stem: bool = False
    # int8 forwards for every encoder conv (ops/int8_conv.py); exclusive
    # with the packed experiments (both rewrite the same convs)
    int8: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool):
        if self.int8 and (self.packed_layer1 or self.packed_stem):
            raise ValueError("encoder int8 and packed modes are exclusive")
        x = (img - 0.45) / 0.225
        if self.int8:
            k, _ = _ConvParams(
                64,
                3,
                kernel=7,
                use_bias=False,
                kernel_init=kaiming_normal_out,
                name="Conv_0",
            )()
            x = int8_conv(
                x.astype(self.dtype), k, (2, 2), ((3, 3), (3, 3))
            )
        elif self.packed_stem and img.shape[1] % 4 == 0 and img.shape[2] % 4 == 0:
            # 7x7 s2 at Cin=3 runs ~3% MXU; the (4,4)->(2,2) packed form
            # contracts 48 channels per tap into 256 lanes (packed_conv.py).
            # Same logical kernel parameter, pinned to nn.Conv's child name.
            k, _ = _ConvParams(
                64,
                3,
                kernel=7,
                use_bias=False,
                kernel_init=kaiming_normal_out,
                name="Conv_0",
            )()
            x = packed_stem_conv(x, k.astype(self.dtype))
        else:
            x = nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding=((3, 3), (3, 3)),
                use_bias=False,
                kernel_init=kaiming_normal_out,
                dtype=self.dtype,
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        f0 = nn.relu(x)

        x = max_pool_3x3_s2_p1(f0)
        if self.packed_layer1:
            x = space_to_depth_rect(x, 1, 2)
            for _ in range(2):
                x = BasicBlock(64, packed=(1, 2), dtype=self.dtype)(x, train)
            x = depth_to_space_rect(x, 1, 2)
        else:
            for _ in range(2):
                x = BasicBlock(64, int8=self.int8, dtype=self.dtype)(x, train)
        f1 = x
        x = BasicBlock(128, stride=2, int8=self.int8, dtype=self.dtype)(x, train)
        x = BasicBlock(128, int8=self.int8, dtype=self.dtype)(x, train)
        f2 = x
        x = BasicBlock(256, stride=2, int8=self.int8, dtype=self.dtype)(x, train)
        x = BasicBlock(256, int8=self.int8, dtype=self.dtype)(x, train)
        f3 = x
        x = BasicBlock(512, stride=2, int8=self.int8, dtype=self.dtype)(x, train)
        x = BasicBlock(512, int8=self.int8, dtype=self.dtype)(x, train)
        f4 = x
        return (f0, f1, f2, f3, f4)


class ConvBlock(nn.Module):
    """ReflectConv3x3 + ELU (depth_model.py:97-109)."""

    features: int
    packed: bool | str = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.elu(
            ReflectConv3x3(self.features, packed=self.packed, dtype=self.dtype)(x)
        )


class DepthDecoder(nn.Module):
    """Skip decoder with sigmoid disp heads (depth_model.py:135-191).

    With ``packed=True`` the 16/32-channel segment (scales 1-0, the
    resolution-dominant convs) runs on space-to-depth packed tensors: those
    convs are lane-bound on TPU (C_out << 128) and packing measured 1.7-2.5x
    faster on v5e (scripts/bench_conv.py). Child module names are pinned so
    the parameter tree is identical in both modes.
    """

    num_scales: int = 3
    packed: bool = True
    # Extra disp heads at scales [num_scales, num_scales+extra): used by the
    # half-resolution loss dial (JointModel.loss_base_scale), whose loss
    # pyramid is based one octave down and so needs one coarser disp. The
    # extra heads get NEW parameter names (ReflectConv3x3_x{scale}) so the
    # default tree -- and checkpoint grafting by name -- is unchanged.
    extra_head_scales: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        outputs = {}
        x = features[-1]
        idx = 0
        is_packed = False
        for scale in range(4, -1, -1):
            if is_packed is True and scale == 0:
                # widen to (2,4) packing before the scale-0 segment: its 16
                # logical channels x8 = 128 fill the lane dim for the two
                # full-res convs (3.94 -> 2.69 ms each on hardware; PERF.md);
                # repacking here, at half resolution, is half the bytes of
                # repacking after the upsample
                x = repack_22_to_24(x)
                is_packed = "24"
            x = ConvBlock(
                _DEC_CH[scale], packed=is_packed, name=f"ConvBlock_{idx}",
                dtype=self.dtype,
            )(x)
            idx += 1
            if is_packed and scale == 0:
                # no skip concat at scale 0: upsample without leaving packed
                # space (saves two full-res transposes + resize layout copies)
                x = packed_upsample2x_bilinear_24(x)
            else:
                if is_packed:
                    x = depth_to_space(x)
                    is_packed = False
                x = upsample2x_bilinear(x)
                if scale > 0:
                    x = jnp.concatenate([x, features[scale - 1]], axis=-1)
                if self.packed and scale <= 1:
                    # (2,2) here: the scale-1 segment's 96-channel concat
                    # input already fills 384 lanes; (2,4) doubles its MACs
                    # for no win (42.7 -> 41.6 fps measured). The 16-channel
                    # scale-0 segment widens to (2,4) below.
                    x = space_to_depth(x)
                    is_packed = True
            x = ConvBlock(
                _DEC_CH[scale], packed=is_packed, name=f"ConvBlock_{idx}",
                dtype=self.dtype,
            )(x)
            idx += 1
            if scale < self.num_scales + self.extra_head_scales:
                name = (
                    f"ReflectConv3x3_{self.num_scales - 1 - scale}"
                    if scale < self.num_scales
                    else f"ReflectConv3x3_x{scale}"
                )
                head = ReflectConv3x3(
                    1, packed=is_packed, name=name, dtype=self.dtype,
                )
                disp = head(x)
                if is_packed == "24":
                    disp = depth_to_space_rect(disp, 2, 4)
                elif is_packed:
                    disp = depth_to_space(disp)
                outputs[scale] = nn.sigmoid(disp)
        return [outputs[s] for s in range(self.num_scales + self.extra_head_scales)]


class DepthNet(nn.Module):
    """Encoder + decoder; returns disp pyramid [full, 1/2, 1/4, ...]."""

    num_scales: int = 3
    packed: bool = True
    packed_encoder: bool = False
    packed_stem: bool = False
    encoder_int8: bool = False
    extra_head_scales: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        assert min(img.shape[1], img.shape[2]) >= 64, (
            "DepthNet needs input >= 64px per side (the 1/32-scale encoder "
            f"features must be >= 2px for reflection padding); got {img.shape}"
        )
        features = ResNet18Encoder(
            packed_layer1=self.packed_encoder,
            packed_stem=self.packed_stem,
            int8=self.encoder_int8,
            dtype=self.dtype,
        )(img, train)
        return DepthDecoder(
            num_scales=self.num_scales, packed=self.packed,
            extra_head_scales=self.extra_head_scales, dtype=self.dtype,
        )(features)
