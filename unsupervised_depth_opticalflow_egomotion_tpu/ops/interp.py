"""Resize primitives with the exact sampling semantics the loss graph depends on.

The reference pipeline mixes two resize conventions (see
/root/reference/core/networks/model_geometry.py:65-72 and
/root/reference/core/networks/structures/depth_model.py:128-133):

- ``resize_bilinear``: half-pixel-centred bilinear without antialiasing
  (torch ``F.interpolate(mode='bilinear', align_corners=False)``).
- ``resize_area``: adaptive average pooling (torch ``mode='area'``); for the
  pyramid ratios used here (powers of two of a /64-divisible input) this is an
  exact k x k block mean, which we implement with a reduce_window so XLA lowers
  it to a fused VPU reduction instead of a gather.

All tensors are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pow2_ratio(src: int, dst: int) -> int | None:
    """Return k for dst == src * 2**k (k<0 = downsample), else None."""
    if src <= 0 or dst <= 0:
        return None
    big, small = (dst, src) if dst >= src else (src, dst)
    if big % small:
        return None
    r = big // small
    if r & (r - 1):
        return None
    return r.bit_length() - 1 if dst >= src else -(r.bit_length() - 1)


def _axis_up_pow2(y: jax.Array, axis: int, n: int) -> jax.Array:
    """One-shot factor-n (n = 2**k) half-pixel bilinear upsample along axis.

    Output o = n*i + p samples source coordinate i + f_p with
    f_p = (p + 0.5 - n/2)/n in (-0.5, 0.5): a fixed 2-tap blend per phase,
    realized as shifted adds + a phase interleave (no dot_generals).
    """
    m = y.shape[axis]
    lo = jnp.concatenate(
        [jax.lax.slice_in_dim(y, 0, 1, axis=axis),
         jax.lax.slice_in_dim(y, 0, m - 1, axis=axis)], axis
    )
    hi = jnp.concatenate(
        [jax.lax.slice_in_dim(y, 1, m, axis=axis),
         jax.lax.slice_in_dim(y, m - 1, m, axis=axis)], axis
    )
    phases = []
    for p in range(n):
        f = (p + 0.5 - n / 2.0) / n
        nb, af = (lo, -f) if f < 0 else (hi, f)
        phases.append(y * jnp.asarray(1.0 - af, y.dtype) + nb * jnp.asarray(af, y.dtype))
    st = jnp.stack(phases, axis=axis + 1)
    shape = list(y.shape)
    shape[axis] *= n
    return st.reshape(shape)


def _axis_down_pow2(y: jax.Array, axis: int, n: int) -> jax.Array:
    """Factor-1/n (n = 2**k) half-pixel bilinear downsample along axis.

    Output o samples source coordinate n*o + (n-1)/2: always frac 0.5 on the
    two middle elements of each n-block -> mean of two strided slices.
    """
    c0 = n // 2 - 1
    a = jax.lax.slice_in_dim(y, c0, y.shape[axis], stride=n, axis=axis)
    b = jax.lax.slice_in_dim(y, c0 + 1, y.shape[axis], stride=n, axis=axis)
    return (a + b) * jnp.asarray(0.5, y.dtype)


def resize_bilinear(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize (align_corners=False, no antialias) on NHWC tensors.

    Power-of-two ratios (the only ones the training graph uses: disp-smooth
    upsamples, PWC output flows, the geometry image pyramid) take a
    closed-form shifted-add path; jax.image.resize lowers to per-axis
    dot_generals whose operand layouts cost full-tensor copies on TPU
    (PERF.md). Equality with jax.image.resize is pinned in
    tests/test_ops.py::TestResizePow2.
    """
    b, h, w, c = x.shape
    nh, nw = int(hw[0]), int(hw[1])
    if (nh, nw) == (h, w):
        return x
    kh, kw = _pow2_ratio(h, nh), _pow2_ratio(w, nw)
    if kh is not None and kw is not None:
        y = x
        for axis, k in ((1, kh), (2, kw)):
            if k > 0:
                y = _axis_up_pow2(y, axis, 1 << k)
            elif k < 0:
                y = _axis_down_pow2(y, axis, 1 << -k)
        return y
    return jax.image.resize(x, (b, nh, nw, c), method="linear", antialias=False)


def resize_area(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """Area (adaptive-average) downsample on NHWC tensors.

    Exact for integer downscale factors; falls back to bilinear+antialias for
    non-integer ratios (not used by the standard KITTI configs).
    """
    b, h, w, c = x.shape
    nh, nw = int(hw[0]), int(hw[1])
    if (nh, nw) == (h, w):
        return x
    if h % nh == 0 and w % nw == 0:
        kh, kw = h // nh, w // nw
        summed = jax.lax.reduce_window(
            x,
            np.zeros((), x.dtype)[()],
            jax.lax.add,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, kh, kw, 1),
            padding="VALID",
        )
        return summed / jnp.asarray(kh * kw, x.dtype)
    return jax.image.resize(x, (b, nh, nw, c), method="linear", antialias=True)


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """x2 bilinear upsample (align_corners=False), used between PWC levels
    and decoder scales.

    Closed form for the exact factor 2: output row 2i = 0.75*y[i] +
    0.25*y[i-1], row 2i+1 = 0.75*y[i] + 0.25*y[i+1] (edges clamped), then the
    same along columns. Implemented as shifted adds + interleave reshapes:
    jax.image.resize lowers to per-axis dot_generals whose operand layouts
    cost full-tensor copies on TPU (visible as multi-hundred-MB 'data
    formatting' in the step profile); this form fuses into two VPU passes.
    """
    b, h, w, c = x.shape

    def axis_up(y, axis):
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(y, 0, 1, axis=axis),
             jax.lax.slice_in_dim(y, 0, y.shape[axis] - 1, axis=axis)], axis
        )
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(y, 1, y.shape[axis], axis=axis),
             jax.lax.slice_in_dim(y, y.shape[axis] - 1, y.shape[axis], axis=axis)], axis
        )
        even = 0.75 * y + 0.25 * lo
        odd = 0.75 * y + 0.25 * hi
        st = jnp.stack([even, odd], axis=axis + 1)
        shape = list(y.shape)
        shape[axis] *= 2
        return st.reshape(shape)

    return axis_up(axis_up(x, 1), 2)


def image_pyramid(img: jax.Array, num_scales: int, mode: str = "bilinear") -> list[jax.Array]:
    """Multi-scale pyramid [full, 1/2, 1/4, ...] of an NHWC image.

    ``mode='bilinear'`` mirrors the geometry/depth models' pyramid
    (model_geometry.py:65-72); ``mode='area'`` mirrors the flow model's
    (model_flow.py:58-64).
    """
    h, w = img.shape[1], img.shape[2]
    fn = resize_bilinear if mode == "bilinear" else resize_area
    return [fn(img, (h // (2**s), w // (2**s))) for s in range(num_scales)]
