"""Multi-scale depth/pose reconstruction of the center frame.

Mirrors /root/reference/core/networks/model_geometry.py:80-103: per scale the
source image is area-resized, the intrinsics' first two rows are divided by
the downscale factor, and inverse_warp2 produces (reconstruction, validity,
projected source depth, computed depth).
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import inverse_warp2
from .interp import resize_area


def _scale_K(intrinsics, downscale):
    return jnp.concatenate(
        [intrinsics[:, 0:2] / downscale, intrinsics[:, 2:]], axis=1
    )


def multiscale_reconstruction(ref_img, intrinsics, depths, depths_ref, pose, sample_ref_depth=True):
    """Reconstruct the target at every scale of the depth pyramid.

    Args:
      ref_img: source image [B,H,W,3]
      intrinsics: [B,3,3] at full resolution
      depths / depths_ref: pyramids of [B,h,w,1] target / source depth
      pose: [B,6] target->source

    Returns four pyramids (reconstructed_img, valid_mask, projected_depth,
    computed_depth).
    """
    h0 = ref_img.shape[1]
    recs, valids, pdepths, cdepths = [], [], [], []
    for depth, depth_ref in zip(depths, depths_ref):
        h, w = depth.shape[1], depth.shape[2]
        ref_scaled = resize_area(ref_img, (h, w))
        K_scaled = _scale_K(intrinsics, h0 / h)
        rec, valid, pdepth, cdepth = inverse_warp2(
            ref_scaled, depth, depth_ref, pose, K_scaled,
            sample_ref_depth=sample_ref_depth,
        )
        recs.append(rec)
        valids.append(valid)
        pdepths.append(pdepth)
        cdepths.append(cdepth)
    return recs, valids, pdepths, cdepths
