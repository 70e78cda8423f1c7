#!/usr/bin/env python
"""Microbenchmark: bilinear-sample gather strategies on the attached TPU.

Compares, at the geom step's hot shapes (b16 = fused fwd+bwd directions):
  4tap : current grid_sample (4 flat row-gathers of [B*HW, C])
  pair : 2 gathers from an x-pair-packed source [B*HW, 2C]
  quad : 1 gather from a 4-tap-packed source [B*HW, 4C]
Forward-only and forward+backward (VJP) timings.

Run: python scripts/bench_gather.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")


def tap_weights(i, size):
    i0 = jnp.floor(i)
    frac = i - i0
    w_lo, w_hi = 1.0 - frac, frac
    inb_lo = (i0 >= 0) & (i0 <= size - 1)
    inb_hi = (i0 + 1 >= 0) & (i0 + 1 <= size - 1)
    start = jnp.clip(i0, 0, size - 2)

    def pos_weight(k):
        p = start + k
        return jnp.where(inb_lo & (p == i0), w_lo, 0.0) + jnp.where(
            inb_hi & (p == i0 + 1), w_hi, 0.0
        )

    return start.astype(jnp.int32), pos_weight(0), pos_weight(1)


def coords_and_weights(img_shape, coords):
    b, h, w, c = img_shape
    ix = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    iy = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    ys, wy0, wy1 = tap_weights(iy, h)
    xs, wx0, wx1 = tap_weights(ix, w)
    batch_off = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]
    base = (ys * w + xs).reshape(b, -1) + batch_off
    return base.reshape(-1), wy0, wy1, wx0, wx1


def sample_4tap(img, coords):
    b, h, w, c = img.shape
    dt = img.dtype
    base, wy0, wy1, wx0, wx1 = coords_and_weights(img.shape, coords)
    flat = img.reshape(b * h * w, c)

    def tap(off):
        return flat[base + off].reshape(coords.shape[:3] + (c,))

    wy0, wy1, wx0, wx1 = (x.astype(dt)[..., None] for x in (wy0, wy1, wx0, wx1))
    return (
        tap(0) * (wy0 * wx0)
        + tap(1) * (wy0 * wx1)
        + tap(w) * (wy1 * wx0)
        + tap(w + 1) * (wy1 * wx1)
    )


def sample_pair(img, coords):
    b, h, w, c = img.shape
    dt = img.dtype
    base, wy0, wy1, wx0, wx1 = coords_and_weights(img.shape, coords)
    flat = img.reshape(b * h * w, c)
    pair = jnp.concatenate([flat, jnp.roll(flat, -1, axis=0)], axis=-1)  # [N, 2C]

    def tap2(off):
        r = pair[base + off].reshape(coords.shape[:3] + (2 * c,))
        return r[..., :c], r[..., c:]

    wy0, wy1, wx0, wx1 = (x.astype(dt)[..., None] for x in (wy0, wy1, wx0, wx1))
    t00, t01 = tap2(0)
    t10, t11 = tap2(w)
    return t00 * (wy0 * wx0) + t01 * (wy0 * wx1) + t10 * (wy1 * wx0) + t11 * (wy1 * wx1)


def sample_quad(img, coords):
    b, h, w, c = img.shape
    dt = img.dtype
    base, wy0, wy1, wx0, wx1 = coords_and_weights(img.shape, coords)
    flat = img.reshape(b * h * w, c)
    quad = jnp.concatenate(
        [
            flat,
            jnp.roll(flat, -1, axis=0),
            jnp.roll(flat, -w, axis=0),
            jnp.roll(flat, -(w + 1), axis=0),
        ],
        axis=-1,
    )  # [N, 4C]
    r = quad[base].reshape(coords.shape[:3] + (4 * c,))
    wy0, wy1, wx0, wx1 = (x.astype(dt)[..., None] for x in (wy0, wy1, wx0, wx1))
    return (
        r[..., 0 * c : 1 * c] * (wy0 * wx0)
        + r[..., 1 * c : 2 * c] * (wy0 * wx1)
        + r[..., 2 * c : 3 * c] * (wy1 * wx0)
        + r[..., 3 * c : 4 * c] * (wy1 * wx1)
    )


def timeit(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # force completion via scalar fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3, s


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    cases = [
        ("img 16x256x832x3 bf16", (16, 256, 832, 3), jnp.bfloat16),
        ("img 16x128x416x3 bf16", (16, 128, 416, 3), jnp.bfloat16),
        ("feat 16x64x208x32 bf16", (16, 64, 208, 32), jnp.bfloat16),
        ("feat 16x16x52x128 bf16", (16, 16, 52, 128), jnp.bfloat16),
    ]
    for name, shape, dt in cases:
        b, h, w, c = shape
        img = jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(dt)
        # realistic flow-like coords: identity + noise
        fx = rng.rand(b, h, w).astype(np.float32) * 20 - 10
        fy = rng.rand(b, h, w).astype(np.float32) * 8 - 4
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        gx = 2 * (xx[None] + fx) / (w - 1) - 1
        gy = 2 * (yy[None] + fy) / (h - 1) - 1
        coords = jnp.asarray(np.stack([gx, gy], -1).astype(np.float32))

        fns = {"4tap": sample_4tap, "pair": sample_pair, "quad": sample_quad}
        sums = {}
        for fname, fn in fns.items():
            jf = jax.jit(fn)
            ms, s = timeit(jf, img, coords)
            sums[fname] = s
            # fwd+bwd
            gf = jax.jit(
                jax.grad(lambda im, co: jnp.sum(fn(im, co).astype(jnp.float32)))
            )
            msb, _ = timeit(gf, img, coords)
            print(f"{name:26s} {fname}: fwd {ms:7.2f} ms  fwd+bwd {msb:7.2f} ms")
        ref = sums["4tap"]
        for k, v in sums.items():
            if abs(v - ref) > abs(ref) * 2e-2 + 1.0:
                print(f"  MISMATCH {k}: {v} vs {ref}")


if __name__ == "__main__":
    main()
