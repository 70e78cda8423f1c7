"""Multi-scale depth/pose reconstruction of the center frame.

Mirrors /root/reference/core/networks/model_geometry.py:80-103: per scale the
source image is area-resized, the intrinsics' first two rows are divided by
the downscale factor, and inverse_warp2 produces (reconstruction, validity,
projected source depth, computed depth).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import inverse_warp2, rigid_projection
from .interp import resize_area
from .masks import flow_norm
from .warp import grid_sample


def _scale_K(intrinsics, downscale):
    return jnp.concatenate(
        [intrinsics[:, 0:2] / downscale, intrinsics[:, 2:]], axis=1
    )


def multiscale_recon_dynamic(
    ref_img,
    intrinsics,
    depths,
    depths_ref,
    pose,
    flows,
    alpha: float,
    beta: float,
    sample_ref_depth: bool = False,
    ref_img_u8=None,
):
    """Reconstruction + dynamic-region masks from ONE projection per scale.

    The geom objective runs both inverse_warp2 (model_geometry.py:80-103) and
    the rigid-flow dynamic masks (model_geometry.py:685-713) on the same
    (depth, pose, K/2^s) every scale; this computes the shared
    pixel2cam+projection once (geometry.rigid_projection) and derives both.

    Returns (recs, valids, pdepths, cdepths, flow_diffs, dyn_masks, scores):
    the first four as multiscale_reconstruction, the last three as
    masks.dynamic_masks -- bound = alpha*(|f|^2+|r|^2)+beta, mask =
    |f-r|^2 < bound under stop_gradient, score = 1/(1e-4+|f-r|).

    ``ref_img_u8``: optional raw uint8 copy of the full-res ref_img; the
    scale-0 reconstruction gathers its rows instead (half the gather bytes;
    1/255 folded into the bilinear weights, ops/warp.py). Not used when
    ``sample_ref_depth`` needs a float depth channel in the same gather.
    """
    h0 = ref_img.shape[1]
    recs, valids, pdepths, cdepths = [], [], [], []
    flow_diffs, dyn_masks, scores = [], [], []
    for depth, depth_ref, flow in zip(depths, depths_ref, flows):
        h, w = depth.shape[1], depth.shape[2]
        ref_scaled = resize_area(ref_img, (h, w))
        K_scaled = _scale_K(intrinsics, h0 / h)
        coords, valid, cdepth, rigid = rigid_projection(depth, pose, K_scaled)

        if sample_ref_depth:
            sampled = grid_sample(
                jnp.concatenate([ref_scaled, depth_ref.astype(ref_scaled.dtype)], -1),
                coords,
            )
            recs.append(sampled[..., :3])
            pdepths.append(jnp.maximum(sampled[..., 3:], 1e-3))
        elif h == h0 and ref_img_u8 is not None:
            recs.append(grid_sample(ref_img_u8, coords, out_dtype=ref_img.dtype))
            pdepths.append(None)
        else:
            recs.append(grid_sample(ref_scaled, coords, src_is_data=True))
            pdepths.append(None)
        valids.append(valid.astype(ref_scaled.dtype))
        cdepths.append(cdepth)

        bound = alpha * (flow_norm(flow) ** 2 + flow_norm(rigid) ** 2) + beta
        diff = jnp.abs(rigid - flow)
        dn = flow_norm(diff)
        flow_diffs.append(diff)
        dyn_masks.append(jax.lax.stop_gradient((dn**2 < bound).astype(flow.dtype)))
        scores.append(jax.lax.stop_gradient(1.0 / (1e-4 + dn)))
    return recs, valids, pdepths, cdepths, flow_diffs, dyn_masks, scores


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
