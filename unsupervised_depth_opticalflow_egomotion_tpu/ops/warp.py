"""Bilinear sampling and flow warping (NHWC).

Grid-sample semantics mirror the reference's torch ``F.grid_sample`` usage:
normalized coords in [-1, 1] with pixel 0 at -1 and pixel N-1 at +1
(align_corners=True -- the reference normalizes with ``2*x/(W-1)-1``, see
/root/reference/core/networks/structures/net_utils.py:42-43 and
inverse_warp.py:249-251), bilinear interpolation, zeros padding: any corner
outside the image contributes 0.

Implemented as one fused gather over the flattened spatial dim --- XLA lowers
this to a TPU gather; the four corner taps share a single index tensor layout
so the compiler can fuse the weight math into the gather consumers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample ``img`` [B,H,W,C] at normalized ``coords`` [B,Ho,Wo,2].

    coords[..., 0] is x in [-1, 1] (align_corners=True), coords[..., 1] is y.
    Zeros padding outside the image.
    """
    b, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    dtype = img.dtype

    # Unnormalize (align_corners=True).
    ix = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    iy = (coords[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    # Bilinear weights.
    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1

    def in_bounds(xf, yf):
        return (xf >= 0) & (xf <= w - 1) & (yf >= 0) & (yf <= h - 1)

    img_flat = img.reshape(b, h * w, c)

    def tap(xf, yf, wgt):
        valid = in_bounds(xf, yf)
        xi = jnp.clip(xf, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yf, 0, h - 1).astype(jnp.int32)
        idx = (yi * w + xi).reshape(b, ho * wo, 1)
        vals = jnp.take_along_axis(img_flat, idx, axis=1).reshape(b, ho, wo, c)
        wgt = jnp.where(valid, wgt, 0.0).astype(dtype)
        return vals * wgt[..., None]

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """[H,W,2] grid of (x, y) pixel coordinates."""
    xx = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    yy = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    return jnp.stack([xx, yy], axis=-1)


def normalize_coords(coords_px: jax.Array, h: int, w: int) -> jax.Array:
    """Pixel coords [..., 2] (x, y) -> normalized [-1, 1] (align_corners=True)."""
    gx = 2.0 * coords_px[..., 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * coords_px[..., 1] / max(h - 1, 1) - 1.0
    return jnp.stack([gx, gy], axis=-1)


def warp_flow(x: jax.Array, flow: jax.Array, use_mask: bool = False) -> jax.Array:
    """Backward-warp ``x`` [B,H,W,C] by optical flow [B,H,W,2] (x-dx, y-dy order).

    With ``use_mask`` the result is multiplied by a hard validity mask
    (warped ones thresholded at 0.9999 -- net_utils.py:47-52).
    """
    b, h, w, _ = x.shape
    grid = pixel_grid(h, w, flow.dtype)[None]
    coords = normalize_coords(grid + flow, h, w)
    out = grid_sample(x, coords)
    if use_mask:
        ones = jnp.ones_like(x)
        mask = grid_sample(ones, coords)
        mask = jnp.where(mask < 0.9999, 0.0, 1.0).astype(x.dtype)
        return out * mask
    return out
