"""Space-to-depth packed 3x3 convolutions for small-channel layers.

TPU lane economics: NHWC convs put the output-channel dim on the 128-lane
axis, so the depth decoder / feature pyramid convs (C_out = 1/16/32 at high
resolution) run at <=25% (often <=12.5%) MXU lane utilization, and their
activations waste the same fraction of HBM bandwidth via lane padding.
Packing 2x2 spatial blocks into channels ([B,H,W,C] -> [B,H/2,W/2,4C]) and
remapping the 3x3 kernel onto a 3x3 conv over packed blocks (with structural
zeros) trades 4x redundant MACs for 8x better lane occupancy -- measured
1.7-2.5x faster on v5e for the shapes this package uses
(scripts/bench_conv.py; PERF.md).

Exactness: position t = oy + ky - 1 of a logical tap lands in packed block
KY = t//2 + 1 at sub-row dy = t % 2. Rows t = -2 / t = H+1 are never
referenced, so zero-padding the packed tensor reproduces zero padding of the
logical tensor exactly; stride-2 convs map to stride-2 packed convs with
asymmetric (1,0) padding. The reference's reflection padding
(/root/reference/core/networks/structures/depth_model.py:111-126) is
reproduced in packed space by constructing halo blocks from slices (the
reflected row x[1] lives in packed block 0 at dy=1, etc.).

Channel layout convention: packed channel index = ((dy*2 + dx) * C + c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,H/2,W/2,4C] with (dy,dx,c) channel layout."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"pack needs even H,W; got {x.shape}"
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """[B,H,W,4C] -> [B,2H,2W,C], inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def _pack_positions(stride: int):
    """(oy, ky) -> (KY, dy) tap map for one axis; None = structurally zero."""
    # logical row offset of tap ky for packed output sub-row oy:
    #   stride 1: t = oy + ky - 1   (3x3, pad 1)
    #   stride 2: t = 2*oy + ky - 1 (3x3, pad 1, output packed again)
    out = {}
    for oy in range(2):
        for ky in range(3):
            t = stride * oy + ky - 1
            out[(oy, ky)] = (t // 2 + 1, t % 2)
    return out


def pack_kernel(w: jax.Array, stride: int = 1) -> jax.Array:
    """Remap a logical [3,3,Cin,Co] kernel to packed [3,3,4Cin,4Co].

    The packed conv (stride 1: SAME padding; stride 2: padding (1,0)) over the
    space-to-depth input reproduces the logical conv's space-to-depth output.
    """
    assert w.shape[:2] == (3, 3), f"only 3x3 kernels; got {w.shape}"
    assert stride in (1, 2)
    cin, co = w.shape[2], w.shape[3]
    pos = _pack_positions(stride)
    wp = jnp.zeros((3, 3, 4 * cin, 4 * co), w.dtype)
    for oy in range(2):
        for ox in range(2):
            for ky in range(3):
                for kx in range(3):
                    KY, dy = pos[(oy, ky)]
                    KX, dx = pos[(ox, kx)]
                    ci = (dy * 2 + dx) * cin
                    coo = (oy * 2 + ox) * co
                    wp = wp.at[KY, KX, ci : ci + cin, coo : coo + co].add(
                        w[ky, kx]
                    )
    return wp


def packed_conv(
    xp: jax.Array, w: jax.Array, bias: jax.Array | None = None, stride: int = 1
) -> jax.Array:
    """3x3 conv on a packed tensor from the LOGICAL kernel/bias.

    xp: packed input [B,H/2,W/2,4Cin]; w: logical [3,3,Cin,Co]. Returns the
    packed output ([B,H/2,W/2,4Co] for stride 1, [B,H/4,W/4,4Co] for
    stride 2), equal to space_to_depth(conv3x3(x, w, zero-pad)).
    """
    wp = pack_kernel(w, stride)
    if stride == 2:
        # the stride-2 output is packed again, so it must itself be even
        assert xp.shape[1] % 2 == 0 and xp.shape[2] % 2 == 0, (
            f"packed stride-2 conv needs logical H,W % 4 == 0; got packed {xp.shape}"
        )
    pad = ((1, 1), (1, 1)) if stride == 1 else ((1, 0), (1, 0))
    out = jax.lax.conv_general_dilated(
        xp,
        wp.astype(xp.dtype),
        (stride, stride),
        pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias, 4).astype(out.dtype)
    return out


def packed_reflect_pad1(xp: jax.Array) -> jax.Array:
    """Width-1 logical reflection pad in packed space: adds one halo block per
    side whose referenced sub-rows/cols hold the reflected rows (row -1 =
    x[1] = block 0 dy=1; row H = x[H-2] = last block dy=0); the structurally
    unreferenced sub-positions (rows -2, H+1) are zero. Composes with a
    VALID packed conv (pack_kernel stride 1) to reproduce ReflectConv3x3.

    Built from pure 4D channel slices (channel layout (dy*2+dx)*C + c: dy
    groups are the two contiguous halves, dx groups the two contiguous
    quarters inside each) -- an earlier 6D-reshape + .at[].set construction
    materialized ~6 full copies of the padded tensor per conv (~1.5 GB/step
    of 'data formatting' in the profile)."""
    b, hp, wp_, c4 = xp.shape
    c = c4 // 4
    z2 = jnp.zeros((b, 1, wp_, 2 * c), xp.dtype)
    # top halo row-block: dy=0 half zero, dy=1 half = block 0's dy=1 channels
    top = jnp.concatenate([z2, xp[:, :1, :, 2 * c :]], axis=-1)
    bot = jnp.concatenate([xp[:, -1:, :, : 2 * c], z2], axis=-1)
    v = jnp.concatenate([top, xp, bot], axis=1)
    # left halo col-block: dx=0 quarters zero, dx=1 quarters = col 0's dx=1
    zc = jnp.zeros((b, hp + 2, 1, c), xp.dtype)
    left = jnp.concatenate(
        [zc, v[:, :, :1, c : 2 * c], zc, v[:, :, :1, 3 * c :]], axis=-1
    )
    right = jnp.concatenate(
        [v[:, :, -1:, :c], zc, v[:, :, -1:, 2 * c : 3 * c], zc], axis=-1
    )
    return jnp.concatenate([left, v, right], axis=2)


def packed_upsample2x_bilinear(xp: jax.Array) -> jax.Array:
    """2x bilinear upsample (align_corners=False) in packed space.

    Equals space_to_depth(upsample2x_bilinear(depth_to_space(xp))) without
    the two pack/unpack transposes and the resize's layout copies. Closed
    form per axis on the packed sub-position groups: for logical rows
    y[2k]=A_k (dy=0 channels), y[2k+1]=B_k, the upsampled packed output
    interleaves blocks (0.75A+0.25B_prev | 0.75A+0.25B) and
    (0.75B+0.25A | 0.75B+0.25A_next), edges clamped.
    """
    b, hp, wp_, c4 = xp.shape
    c2 = c4 // 2
    c = c4 // 4

    # row pass on the dy halves
    A, B = xp[..., :c2], xp[..., c2:]
    Bprev = jnp.concatenate([A[:, :1], B[:, :-1]], axis=1)
    Anext = jnp.concatenate([A[:, 1:], B[:, -1:]], axis=1)
    even = jnp.concatenate([0.75 * A + 0.25 * Bprev, 0.75 * A + 0.25 * B], axis=-1)
    odd = jnp.concatenate([0.75 * B + 0.25 * A, 0.75 * B + 0.25 * Anext], axis=-1)
    t = jnp.stack([even, odd], axis=2).reshape(b, 2 * hp, wp_, c4)

    # column pass on the dx quarters inside each dy half
    evens, odds = [], []
    for h0 in (0, c2):
        Aq, Bq = t[..., h0 : h0 + c], t[..., h0 + c : h0 + c2]
        Bp = jnp.concatenate([Aq[:, :, :1], Bq[:, :, :-1]], axis=2)
        An = jnp.concatenate([Aq[:, :, 1:], Bq[:, :, -1:]], axis=2)
        evens.append(
            jnp.concatenate([0.75 * Aq + 0.25 * Bp, 0.75 * Aq + 0.25 * Bq], axis=-1)
        )
        odds.append(
            jnp.concatenate([0.75 * Bq + 0.25 * Aq, 0.75 * Bq + 0.25 * An], axis=-1)
        )
    even_c = jnp.concatenate(evens, axis=-1)
    odd_c = jnp.concatenate(odds, axis=-1)
    return jnp.stack([even_c, odd_c], axis=3).reshape(b, 2 * hp, 2 * wp_, c4)


def packed_conv_reflect(
    xp: jax.Array, w: jax.Array, bias: jax.Array | None = None
) -> jax.Array:
    """Reflection-padded 3x3 stride-1 conv in packed space (disp decoder)."""
    wp = pack_kernel(w, 1)
    out = jax.lax.conv_general_dilated(
        packed_reflect_pad1(xp),
        wp.astype(xp.dtype),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias, 4).astype(out.dtype)
    return out


# ---------------------------------------------------------------- rect packs
# Rectangular (fy, fx) generalization for the 16-channel decoder segment:
# 2x2 packing of 16ch gives 64 packed channels (half the 128 lanes); 2x4
# gives 128 and measures 3.94 -> 2.69 ms on the scale-0 conv shape despite
# 2x the padded MACs (scripts/bench_conv.py table in PERF.md). Channel
# layout generalizes to ((dy*fx + dx) * C + c).


def space_to_depth_rect(x: jax.Array, fy: int, fx: int) -> jax.Array:
    """[B,H,W,C] -> [B,H/fy,W/fx,fy*fx*C]."""
    b, h, w, c = x.shape
    assert h % fy == 0 and w % fx == 0, f"pack {fy}x{fx} needs divisible H,W"
    x = x.reshape(b, h // fy, fy, w // fx, fx, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // fy, w // fx, fy * fx * c)


def depth_to_space_rect(x: jax.Array, fy: int, fx: int) -> jax.Array:
    """Inverse of :func:`space_to_depth_rect`."""
    b, h, w, cf = x.shape
    c = cf // (fy * fx)
    x = x.reshape(b, h, w, fy, fx, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, fy * h, fx * w, c)


def pack_kernel_rect(w: jax.Array, fy: int, fx: int) -> jax.Array:
    """Remap a logical [3,3,Cin,Co] stride-1 kernel onto (fy,fx) packing.

    Always 3x3 in packed space (tap offsets -1..+1 reach at most one block
    beyond each side for any f >= 2), with structural zeros where a
    (sub-position, tap) pair maps elsewhere.
    """
    assert w.shape[:2] == (3, 3), f"only 3x3 kernels; got {w.shape}"
    cin, co = w.shape[2], w.shape[3]
    wp = jnp.zeros((3, 3, fy * fx * cin, fy * fx * co), w.dtype)
    for oy in range(fy):
        for ox in range(fx):
            for ky in range(3):
                for kx in range(3):
                    ty, tx = oy + ky - 1, ox + kx - 1
                    KY, dy = ty // fy + 1, ty % fy
                    KX, dx = tx // fx + 1, tx % fx
                    ci = (dy * fx + dx) * cin
                    coo = (oy * fx + ox) * co
                    wp = wp.at[KY, KX, ci : ci + cin, coo : coo + co].add(
                        w[ky, kx]
                    )
    return wp


def packed_reflect_pad1_rect(xp: jax.Array, fy: int, fx: int) -> jax.Array:
    """Width-1 logical reflection pad on an (fy,fx)-packed tensor.

    Only one halo sub-row/col per side is ever referenced by the 3x3 packed
    kernel (tap offsets reach exactly one logical line past the edge):
      row -1 = x[1]    -> halo block dy = fy-1 <- block 0's dy-group 1
      row H  = x[H-2]  -> halo block dy = 0    <- last block's dy-group fy-2
    and the analogues along the width; every other sub-position is zero.
    """
    b, hp, wp_, cf = xp.shape
    c = cf // (fy * fx)
    gw = fx * c  # channels per dy-group

    def dygroup(t, g):
        return t[..., g * gw : (g + 1) * gw]

    ztop = jnp.zeros((b, 1, wp_, gw), xp.dtype)
    top = jnp.concatenate(
        [ztop] * (fy - 1) + [dygroup(xp[:, :1], 1)], axis=-1
    )
    bot = jnp.concatenate(
        [dygroup(xp[:, -1:], fy - 2 if fy > 1 else 0)] + [ztop] * (fy - 1),
        axis=-1,
    )
    v = jnp.concatenate([top, xp, bot], axis=1)

    zc = jnp.zeros((b, hp + 2, 1, c), xp.dtype)

    def dxslice(t, dy, dx):
        o = (dy * fx + dx) * c
        return t[..., o : o + c]

    left_parts, right_parts = [], []
    for dy in range(fy):
        for dx in range(fx):
            left_parts.append(
                dxslice(v[:, :, :1], dy, 1) if dx == fx - 1 else zc
            )
            right_parts.append(
                dxslice(v[:, :, -1:], dy, fx - 2) if dx == 0 else zc
            )
    left = jnp.concatenate(left_parts, axis=-1)
    right = jnp.concatenate(right_parts, axis=-1)
    return jnp.concatenate([left, v, right], axis=2)


def packed_conv_reflect_rect(
    xp: jax.Array, w: jax.Array, bias: jax.Array | None, fy: int, fx: int
) -> jax.Array:
    """Reflection-padded 3x3 stride-1 conv on an (fy,fx)-packed tensor."""
    wp = pack_kernel_rect(w, fy, fx)
    out = jax.lax.conv_general_dilated(
        packed_reflect_pad1_rect(xp, fy, fx),
        wp.astype(xp.dtype),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias, fy * fx).astype(out.dtype)
    return out


def packed_conv_rect(
    xp: jax.Array,
    w: jax.Array,
    bias: jax.Array | None,
    fy: int,
    fx: int,
) -> jax.Array:
    """Zero-padded 3x3 stride-1 conv on an (fy,fx)-packed tensor.

    Zero-padding one packed block per side reproduces logical zero padding
    exactly: the 3x3 taps reach at most one logical line past each edge, and
    those lines land in the halo blocks' referenced sub-positions (row -1 =
    halo dy = fy-1, row H = halo dy = 0); every other halo sub-position is
    structurally unreferenced by :func:`pack_kernel_rect`.

    Used by the (1,2)-packed ResNet encoder segment (models/depth_net.py):
    the 64-channel stride-1 blocks are lane-bound at C=64, and width-2
    packing fills the 128 lanes for 2x (not 4x) MAC redundancy.
    """
    wp = pack_kernel_rect(w, fy, fx)
    out = jax.lax.conv_general_dilated(
        xp,
        wp.astype(xp.dtype),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias, fy * fx).astype(out.dtype)
    return out


def pack_kernel_stem(w: jax.Array) -> jax.Array:
    """Remap a 7x7 stride-2 pad-3 kernel onto (4,4)-packed input / (2,2)-packed
    output: logical [7,7,Cin,Co] -> packed [3,3,16Cin,4Co].

    The ResNet stem (7x7 s2, Cin=3) runs at ~3% MXU occupancy -- the
    contraction dim is 3 per tap. On the packed form the contraction is
    16*Cin=48 per tap with Co*4=256 output lanes. Derivation: output sub-row
    p in {0,1} of a (2,2) output block at block-row OY is logical out row
    2*OY + p, whose tap ky in 0..6 reads logical input row
    4*OY + (2*p + ky - 3); offsets -3..5 span input blocks OY-1..OY+1, so the
    packed kernel is 3x3 and one zero halo block per side reproduces the
    logical pad-3 zeros exactly (halo sub-rows beyond the pad are
    structurally unreferenced).
    """
    assert w.shape[:2] == (7, 7), f"stem pack needs a 7x7 kernel; got {w.shape}"
    cin, co = w.shape[2], w.shape[3]
    wp = jnp.zeros((3, 3, 16 * cin, 4 * co), w.dtype)
    for p in range(2):
        for q in range(2):
            for ky in range(7):
                for kx in range(7):
                    ty, tx = 2 * p + ky - 3, 2 * q + kx - 3
                    KY, dy = ty // 4 + 1, ty % 4
                    KX, dx = tx // 4 + 1, tx % 4
                    ci = (dy * 4 + dx) * cin
                    coo = (p * 2 + q) * co
                    wp = wp.at[KY, KX, ci : ci + cin, coo : coo + co].add(
                        w[ky, kx]
                    )
    return wp


def packed_stem_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """7x7 stride-2 pad-3 conv via the (4,4)->(2,2) packed form.

    x: logical [B,H,W,Cin] (H,W % 4 == 0); w: logical [7,7,Cin,Co].
    Returns the plain [B,H/2,W/2,Co] output (unpacked), equal to the
    logical conv up to f32 contraction-order roundoff.
    """
    xp = space_to_depth_rect(x, 4, 4)
    out = jax.lax.conv_general_dilated(
        xp,
        pack_kernel_stem(w).astype(xp.dtype),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return depth_to_space(out)


def repack_22_to_24(xp: jax.Array) -> jax.Array:
    """(2,2)-packed [B,H,W,4C] -> (2,4)-packed [B,H,W/2,8C] of the same
    logical tensor: new w-block q covers logical cols 4q..4q+3 = old blocks
    2q (dx 0,1) then 2q+1 (dx 0,1), channel order (dy, we, dx, c).

    Single reshape/transpose/reshape: an earlier concat-of-16-strided-slices
    form had its transpose lowered by XLA as a serialized 104-trip scatter
    loop (8 copies, ~8 ms/step of dynamic-update-slice + predicate fusions in
    the step profile); this form's backward is one transpose."""
    b, hp, wp_, c4 = xp.shape
    c = c4 // 4
    # W index = 2q + we; channels = (dy, dx, c)
    x = xp.reshape(b, hp, wp_ // 2, 2, 2, 2, c)
    # (q, we, dy, dx, c) -> (q, dy, we, dx, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, hp, wp_ // 2, 8 * c)


def packed_upsample2x_bilinear_24(xp: jax.Array) -> jax.Array:
    """2x bilinear upsample (align_corners=False) on a (2,4)-packed tensor.

    Same derivation as :func:`packed_upsample2x_bilinear` with the column
    pass over quarters: output w-block q covers out-cols 4q..4q+3 whose
    source columns are 2q-1..2q+2, i.e. quarters (D_{r-1}, A_r, B_r, C_r)
    for even q = 2r and (B_r, C_r, D_r, A_{r+1}) for odd q (edges clamped).
    """
    b, hp, wp_, cf = xp.shape
    c2 = cf // 2
    c = cf // 8

    # row pass on the dy halves (identical algebra to the (2,2) version)
    A, B = xp[..., :c2], xp[..., c2:]
    Bprev = jnp.concatenate([A[:, :1], B[:, :-1]], axis=1)
    Anext = jnp.concatenate([A[:, 1:], B[:, -1:]], axis=1)
    even = jnp.concatenate([0.75 * A + 0.25 * Bprev, 0.75 * A + 0.25 * B], axis=-1)
    odd = jnp.concatenate([0.75 * B + 0.25 * A, 0.75 * B + 0.25 * Anext], axis=-1)
    t = jnp.stack([even, odd], axis=2).reshape(b, 2 * hp, wp_, cf)

    # column pass on the dx quarters inside each dy half
    evens, odds = [], []
    for h0 in (0, c2):
        q = [t[..., h0 + i * c : h0 + (i + 1) * c] for i in range(4)]
        A_, B_, C_, D_ = q
        Dp = jnp.concatenate([A_[:, :, :1], D_[:, :, :-1]], axis=2)
        An = jnp.concatenate([A_[:, :, 1:], D_[:, :, -1:]], axis=2)
        evens.append(
            jnp.concatenate(
                [
                    0.75 * A_ + 0.25 * Dp,
                    0.75 * A_ + 0.25 * B_,
                    0.25 * A_ + 0.75 * B_,
                    0.75 * B_ + 0.25 * C_,
                ],
                axis=-1,
            )
        )
        odds.append(
            jnp.concatenate(
                [
                    0.25 * B_ + 0.75 * C_,
                    0.75 * C_ + 0.25 * D_,
                    0.25 * C_ + 0.75 * D_,
                    0.75 * D_ + 0.25 * An,
                ],
                axis=-1,
            )
        )
    even_c = jnp.concatenate(evens, axis=-1)
    odd_c = jnp.concatenate(odds, axis=-1)
    return jnp.stack([even_c, odd_c], axis=3).reshape(b, 2 * hp, 2 * wp_, cf)
