"""Self-supervision losses over NHWC pyramids.

Every function returns a per-batch-item vector [B] (sum over scales), matching
the reference's loss packing (each loss is later weighted and ``.mean()``-ed in
the train step, /root/reference/train.py:211-214). Line references point into
/root/reference/core/networks/model_geometry.py unless noted.

All reductions happen in f32 regardless of the compute dtype upstream; masks
and images are multiplied before reduction so the whole loss graph fuses into
a few VPU passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .interp import resize_bilinear
from .masks import flow_normalization
from .ssim import ssim


def _bmean(x: jax.Array) -> jax.Array:
    """Mean over all but the batch dim, in f32."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))


def photometric_loss(imgs, warped, masks) -> jax.Array:
    """Masked L1 photometric loss (:143-153)."""
    per_scale = []
    for img, img_w, mask in zip(imgs, warped, masks):
        divider = _bmean(mask)
        diff = jnp.abs(img - img_w) * mask
        per_scale.append(_bmean(diff) / (divider + 1e-12))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def masked_diff_loss(diffs, masks) -> jax.Array:
    """Precomputed-residual variant used by the flow-only objective
    (model_flow.py:94-103)."""
    per_scale = []
    for diff, mask in zip(diffs, masks):
        divider = _bmean(mask)
        per_scale.append(_bmean(diff * mask) / (divider + 1e-12))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def ssim_loss(imgs, warped, masks) -> jax.Array:
    """Masked DSSIM (:212-223): SSIM computed on mask-multiplied images."""
    per_scale = []
    for img, img_w, mask in zip(imgs, warped, masks):
        divider = _bmean(mask)
        s = ssim(img * mask, img_w * mask)
        l = jnp.clip((1.0 - s) / 2.0, 0.0, 1.0)
        per_scale.append(_bmean(l) / (divider + 1e-12))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def disp_smooth_loss(img, disps, normalize: bool = False) -> jax.Array:
    """Edge-aware first-order disparity smoothness (:225-252).

    Each scale's disp is bilinearly upsampled to the full image resolution
    before differencing, as the reference does. Scales below full resolution
    use :func:`_disp_smooth_folded`, which evaluates the identical sum on the
    coarse grid (the fine differences of a half-pixel bilinear upsample are a
    closed-form 2-tap mix of coarse differences per phase) so neither the
    upsampled disp nor its AD chain is ever materialized at full resolution.
    Exactness vs the direct form is pinned by
    tests/test_ops_golden.py::test_disp_smooth_folded_matches_naive.

    ``normalize=True`` divides each scale's disparity by its per-image
    spatial mean first (monodepth2-style mean-normalized smoothness). The
    un-normalized term's magnitude rides the network's absolute scale, and
    the round-5 depth stage measured the eval AbsRel oscillation co-moving
    with the per-scene median scale factor (corr 0.84 at the run level,
    TRAINING.md r5 scale-drift analysis) -- this is the targeted lever:
    it makes the smoothness pressure scale-invariant. Off by default
    (reference parity).
    """
    h, w = img.shape[1], img.shape[2]
    gx = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), axis=-1, keepdims=True)
    gy = jnp.mean(jnp.abs(img[:, :-1] - img[:, 1:]), axis=-1, keepdims=True)
    wx = jnp.exp(-gx)
    wy = jnp.exp(-gy)
    per_scale = []
    for disp in disps:
        if normalize:
            disp = disp / (jnp.mean(disp, axis=(1, 2, 3), keepdims=True) + 1e-7)
        n = h // disp.shape[1]
        if n == 1:
            dgx = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:]) * wx
            dgy = jnp.abs(disp[:, :-1] - disp[:, 1:]) * wy
            per_scale.append(_bmean(dgx) + _bmean(dgy))
        else:
            per_scale.append(_disp_smooth_folded(disp, wx, wy, n))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def _disp_smooth_naive(img, disps) -> jax.Array:
    """Direct (upsample-then-difference) form, kept as the test oracle."""
    h, w = img.shape[1], img.shape[2]
    gx = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), axis=-1, keepdims=True)
    gy = jnp.mean(jnp.abs(img[:, :-1] - img[:, 1:]), axis=-1, keepdims=True)
    wx = jnp.exp(-gx)
    wy = jnp.exp(-gy)
    per_scale = []
    for disp in disps:
        d = resize_bilinear(disp, (h, w))
        dgx = jnp.abs(d[:, :, :-1] - d[:, :, 1:]) * wx
        dgy = jnp.abs(d[:, :-1] - d[:, 1:]) * wy
        per_scale.append(_bmean(dgx) + _bmean(dgy))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def _shift_clamped(x, s, axis):
    """x[j] -> x[j+s] with edge clamping, s in {-1, +1}."""
    m = x.shape[axis]
    if s < 0:
        body = jax.lax.slice_in_dim(x, 0, m - 1, axis=axis)
        edge = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        return jnp.concatenate([edge, body], axis=axis)
    body = jax.lax.slice_in_dim(x, 1, m, axis=axis)
    edge = jax.lax.slice_in_dim(x, m - 1, m, axis=axis)
    return jnp.concatenate([body, edge], axis=axis)


def _fold_one_axis(diff, wfull, n, daxis, baxis):
    """Sum over the fine grid of |fine-diff of the n x upsampled disp| * w.

    ``diff``: coarse differences along ``daxis`` (length m-1). ``wfull``: the
    full-res weight plane for that axis, zero-padded to a multiple of n along
    ``daxis``. Fine diffs along ``daxis`` within a coarse block are, by phase
    p: p < n/2-1 -> dx[i-1]/n; p = n/2-1 -> (dx[i-1]+dx[i])/(2n);
    p >= n/2 -> dx[i]/n (the block-crossing p = n-1 included). Along the
    other axis (``baxis``) the upsample blends rows j and j+s_q with weight
    a_q = |q+0.5-n/2|/n, which distributes over the difference.

    All (q-phase x class) terms are batched into the trailing channel dim --
    a first cut that looped q/class over [B,Hc,Wc,1] planes priced each op's
    fixed overhead at 1/128 lane occupancy and measured SLOWER than the
    full-res direct form. The pooled weight tables come from one reshape +
    one constant 0/1 matmul; only ``diff`` carries gradients.
    """
    f32 = jnp.float32
    half = n // 2
    zeros = jnp.zeros_like(jax.lax.slice_in_dim(diff, 0, 1, axis=daxis))
    gl = jnp.concatenate([zeros, diff], axis=daxis)  # dx[i-1], 0 at i=0
    gr = jnp.concatenate([diff, zeros], axis=daxis)  # dx[i],   0 at i=m-1
    # class channel order: [L?, M, R]
    parts = [(gl + gr) * (0.5 / n), gr * (1.0 / n)]
    bounds = [(half - 1, half), (half, n)]
    if n > 2:
        parts.insert(0, gl * (1.0 / n))
        bounds.insert(0, (0, half - 1))
    xs = jnp.concatenate(parts, axis=-1)  # [B,Hc,Wc,C']
    ncls = xs.shape[-1]

    a = np.abs((np.arange(n) + 0.5 - n / 2.0) / n).astype(np.float32)
    xm = _shift_clamped(xs, -1, baxis)
    xp = _shift_clamped(xs, +1, baxis)
    lo_b = (1.0 - a[:half]).reshape(-1, 1) * xs[..., None, :] + a[
        :half
    ].reshape(-1, 1) * xm[..., None, :]
    hi_b = (1.0 - a[half:]).reshape(-1, 1) * xs[..., None, :] + a[
        half:
    ].reshape(-1, 1) * xp[..., None, :]
    blends = jnp.concatenate([lo_b, hi_b], axis=-2)  # [B,Hc,Wc,n,C']
    blends = blends.reshape(xs.shape[:-1] + (n * ncls,))

    # pooled weight tables: [B,H,W,1] -> [B,Hb,n,Wb,n] -> [B,Hb,Wb,n*n] @ M
    bN, hF, wF, _ = wfull.shape
    wr = wfull.reshape(bN, hF // n, n, wF // n, n)
    wr = wr.transpose(0, 1, 3, 2, 4).reshape(bN, hF // n, wF // n, n * n)
    # wr channel = r*n + c (r = row phase, c = col phase); blend channel
    # t = q*ncls + cls with q the baxis phase
    M = np.zeros((n * n, n * ncls), np.float32)
    for q in range(n):
        for cls, (lo, hi) in enumerate(bounds):
            for p in range(lo, hi):
                rc = (q * n + p) if daxis == 2 else (p * n + q)
                M[rc, q * ncls + cls] = 1.0
    wtab = jnp.einsum(
        "bhwk,kt->bhwt", wr.astype(f32), jnp.asarray(M)
    )
    return jnp.sum(
        jnp.abs(blends.astype(f32)) * wtab, axis=(1, 2, 3)
    )


def _disp_smooth_folded(disp, wx, wy, n) -> jax.Array:
    """Folded evaluation of one upsampled-scale disp-smooth term (exact)."""
    b, hc, wc, _ = disp.shape
    h, w = n * hc, n * wc
    dx = disp[:, :, 1:] - disp[:, :, :-1]
    dy = disp[:, 1:] - disp[:, :-1]
    # zero-pad the weight planes to full blocks (the padded fine positions
    # pair with structurally-zero diffs)
    wxp = jnp.concatenate(
        [wx, jnp.zeros((b, h, w - wx.shape[2], 1), wx.dtype)], axis=2
    )
    wyp = jnp.concatenate(
        [wy, jnp.zeros((b, h - wy.shape[1], w, 1), wy.dtype)], axis=1
    )
    sx = _fold_one_axis(dx, wxp, n, daxis=2, baxis=1)
    sy = _fold_one_axis(dy, wyp, n, daxis=1, baxis=2)
    return sx / (h * (w - 1)) + sy / ((h - 1) * w)


def _grads(x):
    dy = x[:, 1:] - x[:, :-1]
    dx = x[:, :, 1:] - x[:, :, :-1]
    return dx, dy


def flow_smooth_loss(flows, imgs) -> jax.Array:
    """Second-order edge-aware flow smoothness on flow/20 (:259-279)."""
    per_scale = []
    for flow, img in zip(flows, imgs):
        f = flow / 20.0
        igx, igy = _grads(img)
        wx = jnp.exp(-10.0 * jnp.mean(jnp.abs(igx), axis=-1, keepdims=True))
        wy = jnp.exp(-10.0 * jnp.mean(jnp.abs(igy), axis=-1, keepdims=True))
        dx, dy = _grads(f)
        dx2, _ = _grads(dx)
        _, dy2 = _grads(dy)
        err = _bmean(wx[:, :, 1:] * jnp.abs(dx2)) + _bmean(wy[:, 1:] * jnp.abs(dy2))
        per_scale.append(err / 2.0)
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def flow_consis_loss(fwd_flows, bwd_flows, occ_masks) -> jax.Array:
    """Forward/backward direction consistency on normalized flows (:195-210).

    The backward term is stop-gradiented; the mask is inverted (occluded
    regions drive the consistency).
    """
    per_scale = []
    for fwd, bwd, occ in zip(fwd_flows, bwd_flows, occ_masks):
        fwd_n = flow_normalization(fwd)
        bwd_n = jax.lax.stop_gradient(flow_normalization(bwd))
        mask = 1.0 - occ
        divider = _bmean(mask)
        l = _bmean(jnp.abs(fwd_n + bwd_n) * mask) / (divider + 1e-12)
        per_scale.append(l)
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def depth_consis_loss(predicted_depths, computed_depths, masks) -> jax.Array:
    """Scale-consistent depth loss |c-p|/(c+p), clamped to [0,1] (:182-193)."""
    per_scale = []
    for pred, comp, mask in zip(predicted_depths, computed_depths, masks):
        divider = _bmean(mask)
        diff = jnp.clip(jnp.abs(comp - pred) / jnp.abs(comp + pred), 0.0, 1.0)
        per_scale.append(_bmean(diff * mask) / (divider + 1e-12))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def depth_flow_consis_loss(flow_diffs, masks=None, scales: int = 1) -> jax.Array:
    """|rigid_flow - flow| under a mask, usually top scale only (:716-732)."""
    per_scale = []
    for s in range(scales):
        diff = flow_diffs[s]
        if masks is None:
            mask = jnp.ones(diff.shape[:3] + (1,), diff.dtype)
        else:
            mask = masks[s]
        divider = _bmean(mask)
        per_scale.append(_bmean(diff * mask) / (divider + 1e-12))
    return jnp.sum(jnp.stack(per_scale, axis=1), axis=1)


def epipolar_loss(dist_map, rigid_mask) -> jax.Array:
    """Epipolar distance loss.

    The reference computes the masked mean then overwrites it with the
    unmasked mean (model_geometry.py:413-418, survey defect #8); the effective
    behaviour -- unmasked mean -- is reproduced deliberately.
    """
    del rigid_mask
    return _bmean(dist_map)


def triangulation_loss(tri_depth, pred_tri_depth) -> jax.Array:
    """(1 - pred/tri)^2 over sampled points [B,N,1] (:655-659)."""
    l = (1.0 - pred_tri_depth / (tri_depth + 1e-12)) ** 2
    return jnp.mean(l.astype(jnp.float32), axis=(1, 2))
