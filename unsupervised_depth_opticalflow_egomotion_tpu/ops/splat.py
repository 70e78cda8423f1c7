"""Forward splatting (scatter-based warping) for occlusion reasoning.

The reference calls ``transformerFwd`` for flow-based occlusion masks
(model_flow.py:33-39) but never ships it (survey defect #3 -- the function is
TrianFlow's tensorflow forward-warp). This is the TPU-native equivalent:
bilinear forward splatting via one batched scatter-add.

``occlusion_mask_from_flow``: splat an image of ones along the forward flow;
pixels receiving ~0 mass are occluded in the target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .warp import pixel_grid


def forward_splat(values: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinearly splat ``values`` [B,H,W,C] along ``flow`` [B,H,W,2].

    out[y + fy, x + fx] += w_tap * values[y, x] over the four bilinear taps;
    out-of-frame mass is dropped (zeros semantics).
    """
    b, h, w, c = values.shape
    grid = pixel_grid(h, w, flow.dtype)[None]
    tx = grid[..., 0] + flow[..., 0]
    ty = grid[..., 1] + flow[..., 1]

    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0

    out = jnp.zeros((b, h * w, c), values.dtype)
    vals_flat = values.reshape(b, h * w, c)

    def add_tap(out, xi, yi, wgt):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = (
            jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        ).reshape(b, h * w)
        contrib = vals_flat * jnp.where(inb, wgt, 0.0).reshape(b, h * w)[..., None].astype(
            values.dtype
        )
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(2,),
            inserted_window_dims=(1,),
            scatter_dims_to_operand_dims=(1,),
            operand_batching_dims=(0,),
            scatter_indices_batching_dims=(0,),
        )
        return jax.lax.scatter_add(
            out,
            idx[..., None],
            contrib,
            dn,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    out = add_tap(out, x0, y0, (1 - fx) * (1 - fy))
    out = add_tap(out, x0 + 1, y0, fx * (1 - fy))
    out = add_tap(out, x0, y0 + 1, (1 - fx) * fy)
    out = add_tap(out, x0 + 1, y0 + 1, fx * fy)
    return out.reshape(b, h, w, c)


def forward_splat_nearest_mass(flow: jax.Array) -> jax.Array:
    """Unit-mass coverage [B,H,W,1] splatting each source pixel to its
    single nearest target pixel (one scatter-add instead of four).

    For the stop-gradient clamped occlusion mask the four bilinear taps only
    soften boundary values; nearest-tap coverage is the same mask away from
    boundaries at 1/4 the scatter rows (scatters are the flow-mode hot spot:
    TRAINING.md throughput notes).
    """
    b, h, w, _ = flow.shape
    grid = pixel_grid(h, w, flow.dtype)[None]
    xi = jnp.round(grid[..., 0] + flow[..., 0])
    yi = jnp.round(grid[..., 1] + flow[..., 1])
    inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
    idx = (
        jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
        + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
    ).reshape(b, h * w)
    contrib = jnp.where(inb, 1.0, 0.0).reshape(b, h * w, 1).astype(flow.dtype)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2,),
        inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(1,),
        operand_batching_dims=(0,),
        scatter_indices_batching_dims=(0,),
    )
    out = jax.lax.scatter_add(
        jnp.zeros((b, h * w, 1), flow.dtype),
        idx[..., None],
        contrib,
        dn,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return out.reshape(b, h, w, 1)


def occlusion_mask_from_flow(flow: jax.Array, taps: str = "bilinear") -> jax.Array:
    """Occlusion mask [B,H,W,1] by forward-splatting ones along ``flow``.

    Mirrors the reference's intended get_occlusion_mask_from_flow
    (model_flow.py:33-39): splatted mass clamped to [0, 1]; ~0 = occluded.
    ``taps="nearest"`` uses single-tap coverage (flow_occ_impl="splat_nn");
    ``taps="nearest_half"`` additionally splats planes larger than 64x64 on
    a half-resolution grid (2x2-mean flow / 2) and nearest-upsamples the
    mask -- 1/4 the scatter rows for a boundary-coarser mask.

    ``taps="bilinear"`` takes the windowed Pallas splat kernel
    (ops/pallas/splat_window.py: scatter reformulated as MXU tent-matrix
    matmuls) on TPU for supported shapes -- XLA scatter rows are the
    flow-mode hot spot (253.8 ms/step, PERF.md) and the kernel is parity-
    pinned against this module's scatter form (tests/test_splat_window.py).
    ``taps="bilinear_xla"`` forces the scatter-add form (the A/B escape,
    flow_occ_impl="splat_xla").
    """
    b, h, w, _ = flow.shape
    if taps == "bilinear" and h % 8 == 0 and w >= 128:
        from .pallas.splat_window import (
            kernel_enabled,
            splat_mass_window_guarded,
        )

        if kernel_enabled():
            # guarded: flows beyond the kernel's displacement window fall
            # back to the exact scatter for that step (cheap lax.cond on
            # the coverage-violation count) — extreme motion costs speed,
            # never mass
            mass = splat_mass_window_guarded(flow, out_dtype=flow.dtype)
            return jax.lax.stop_gradient(jnp.clip(mass, 0.0, 1.0))
    if taps == "nearest_half" and h % 2 == 0 and w % 2 == 0 and h * w > 4096:
        fhalf = (
            flow.reshape(b, h // 2, 2, w // 2, 2, 2).mean(axis=(2, 4)) * 0.5
        )
        mass = forward_splat_nearest_mass(fhalf)
        mask = jnp.clip(mass, 0.0, 1.0)
        mask = jnp.repeat(jnp.repeat(mask, 2, axis=1), 2, axis=2)
        return jax.lax.stop_gradient(mask)
    if taps in ("nearest", "nearest_half"):
        mass = forward_splat_nearest_mass(flow)
    else:
        ones = jnp.ones((b, h, w, 1), flow.dtype)
        mass = forward_splat(ones, flow)
    return jax.lax.stop_gradient(jnp.clip(mass, 0.0, 1.0))
