"""PWC-Net style coarse-to-fine flow decoder (NHWC).

Re-design of /root/reference/core/networks/structures/pwc_tf.py for TPU: the
correlation layer is the fused cost-volume op (ops/cost_volume.py) instead of
an 81-iteration python loop of torch ops, warping uses the gather-based
bilinear sampler, and each level's DenseNet-style block is a chain of 3x3
convs that XLA lowers straight onto the MXU.

Level structure (identical to the reference):
  level 6:    corr only -> dense block -> flow6
  level 5..2: warp(feat2, up(flow)) -> corr -> cat(corr, feat1, upflow)
              -> dense block -> flow += upflow
  context:    dilated conv chain (1,2,4,8,16,1) refining flow2
Outputs 4 flows: [H,W], [H/2,W/2], [H/4,W/4], [H/8,W/8] (x4 scaling applied,
pwc_tf.py:173-178).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.cost_volume import correlation
from ..ops.interp import resize_bilinear, upsample2x_bilinear
from ..ops.warp import warp_flow
from .layers import Conv, ConvLReLU

_DD = (128, 128, 96, 64, 32)


class DenseFlowBlock(nn.Module):
    """Five chained convs with dense pairwise concats + 3x3 flow head
    (pwc_tf.py:28-33)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x0 = ConvLReLU(_DD[0], dtype=self.dtype)(x)
        x1 = ConvLReLU(_DD[1], dtype=self.dtype)(x0)
        x2 = ConvLReLU(_DD[2], dtype=self.dtype)(jnp.concatenate([x0, x1], -1))
        x3 = ConvLReLU(_DD[3], dtype=self.dtype)(jnp.concatenate([x1, x2], -1))
        x4 = ConvLReLU(_DD[4], dtype=self.dtype)(jnp.concatenate([x2, x3], -1))
        flow = Conv(2, dtype=self.dtype)(jnp.concatenate([x3, x4], -1))
        return flow, x4


class ContextNet(nn.Module):
    """Dilated refinement chain (pwc_tf.py:76-82)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for ch, d in ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)):
            x = ConvLReLU(ch, padding=d, dilation=d, dtype=self.dtype)(x)
        return Conv(2, dtype=self.dtype)(x)


class PWCDecoder(nn.Module):
    md: int = 4
    # "fused": channel-major Pallas fwd+bwd kernels, single-tensor [B,H,W,81]
    #   output (ops/pallas/correlation_fused.py) -- kills the 81-operand
    #   stack/concat and the 81-plane-copy autodiff backward (round-3 default).
    # "xla": fused 81-shift XLA formulation with autodiff backward.
    # "pallas": round-2 NHWC kernel where it fits, XLA-formulation backward.
    corr_impl: str = "fused"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats1, feats2, img_hw):
        h, w = int(img_hw[0]), int(img_hw[1])
        assert h % 64 == 0 and w % 64 == 0, (
            f"PWC coarse-to-fine levels need H,W divisible by 64; got {img_hw}"
        )
        if self.corr_impl == "fused":
            from ..ops.pallas.correlation_fused import correlation_fused

            corr_fn = lambda a, b: correlation_fused(a, b, self.md)  # noqa: E731
        elif self.corr_impl == "pallas":
            from ..ops.pallas.correlation import correlation_vjp

            corr_fn = lambda a, b: correlation_vjp(a, b, self.md)  # noqa: E731
        else:
            corr_fn = lambda a, b: correlation(a, b, self.md)  # noqa: E731
        c11, c12, c13, c14, c15, c16 = feats1
        c21, c22, c23, c24, c25, c26 = feats2

        corr6 = corr_fn(c16, c26)
        flow6, _ = DenseFlowBlock(dtype=self.dtype)(corr6)
        up_flow6 = upsample2x_bilinear(flow6) * 2.0

        def level(feat1, feat2, up_flow):
            warped = warp_flow(feat2, up_flow, use_mask=False)
            corr = corr_fn(feat1, warped)
            x = jnp.concatenate([corr, feat1, up_flow], -1)
            flow, x4 = DenseFlowBlock(dtype=self.dtype)(x)
            return flow + up_flow, x4

        flow5, _ = level(c15, c25, up_flow6)
        up_flow5 = upsample2x_bilinear(flow5) * 2.0
        flow4, _ = level(c14, c24, up_flow5)
        up_flow4 = upsample2x_bilinear(flow4) * 2.0
        flow3, _ = level(c13, c23, up_flow4)
        up_flow3 = upsample2x_bilinear(flow3) * 2.0
        flow2, x4 = level(c12, c22, up_flow3)

        flow2 = flow2 + ContextNet(dtype=self.dtype)(
            jnp.concatenate([flow2, x4], -1)
        )

        return [
            resize_bilinear(flow2 * 4.0, (h, w)),
            resize_bilinear(flow3 * 4.0, (h // 2, w // 2)),
            resize_bilinear(flow4 * 4.0, (h // 4, w // 4)),
            resize_bilinear(flow5 * 4.0, (h // 8, w // 8)),
        ]
