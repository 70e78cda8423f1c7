"""Probe Mosaic's tpu.dynamic_gather envelope for the warp kernel design.

The planned Pallas warp-gather kernel (ROADMAP: locality-exploiting windowed
warp) decomposes each bilinear tap fetch into (128-block select, intra-vreg
lane shuffle); the shuffle is jnp.take_along_axis(x, idx, axis=1) on a 2D
block, which jax lowers to tpu.dynamic_gather (see
jax._src.pallas.mosaic.lowering._gather_lowering_rule). This probe answers,
on the real chip:
  1. which (shape, dtype) combinations compile (lane axis 128 vs wider),
  2. sublane-axis gather (axis=0) support,
  3. throughput of a gather-heavy kernel vs the XLA row-gather baseline.

Usage: python scripts/probe_dynamic_gather.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")


def _bench(fn, *args, iters=20):
    r = fn(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def probe_compile(shape, dtype, axis):
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    x = jnp.arange(np.prod(shape), dtype=jnp.int32).reshape(shape).astype(dtype)
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, shape[axis], shape), jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
        ref = jnp.take_along_axis(x, idx, axis=axis)
        ok = bool(jnp.all(out == ref))
        return "OK" if ok else "WRONG"
    except Exception as e:  # noqa: BLE001
        return f"FAIL: {str(e).splitlines()[0][:90]}"


def gather_rate_kernel(n_gathers=64, shape=(8, 128), dtype=jnp.float32):
    """ms for a kernel issuing n_gathers chained dynamic_gathers per block."""

    def kernel(x_ref, i_ref, o_ref):
        acc = jnp.zeros(shape, jnp.float32)
        x = x_ref[0]
        idx = i_ref[0]
        for k in range(n_gathers):
            g = jnp.take_along_axis(x, (idx + k) % shape[1], axis=1)
            acc = acc + g.astype(jnp.float32)
        o_ref[0] = acc

    grid = (512,)  # 512 blocks to give the scalar unit something to pipeline
    x = jnp.ones((grid[0], *shape), dtype)
    idx = jnp.zeros((grid[0], *shape), jnp.int32)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((grid[0], *shape), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def run(x, idx):
        return f(x.reshape(grid[0], *shape), idx)

    ms = _bench(jax.jit(run), x, idx)
    total = grid[0] * n_gathers
    print(
        f"  chained dynamic_gather {shape} x{n_gathers}/blk x{grid[0]} blks: "
        f"{ms:.3f} ms = {total / ms * 1e3 / 1e6:.1f} M gathers/s "
        f"({total * shape[0] * shape[1] / ms * 1e3 / 1e9:.2f} G elems/s)"
    )


def xla_row_gather_baseline():
    """The current production gather form: [B*HW] u8 rows of 12B."""
    b, h, w = 8, 256, 832
    src = jnp.ones((b * h * w, 12), jnp.uint8)
    idx = jnp.zeros((b * h * w,), jnp.int32)

    @jax.jit
    def f(src, idx):
        return src[idx]

    ms = _bench(f, src, idx)
    print(
        f"  XLA row-gather baseline ({b*h*w} rows x 12B u8): {ms:.2f} ms = "
        f"{b*h*w/ms*1e3/1e6:.0f} M rows/s"
    )


if __name__ == "__main__":
    print("devices:", jax.devices())
    print("compile envelope:")
    for shape in [(8, 128), (8, 256), (16, 128), (8, 832), (8, 896), (64, 128)]:
        for dtype in [jnp.float32, jnp.int32, jnp.bfloat16, jnp.uint8]:
            r = probe_compile(shape, dtype, axis=1)
            print(f"  lane-gather  {shape} {jnp.dtype(dtype).name}: {r}")
    for shape in [(8, 128), (64, 128), (32, 256)]:
        r = probe_compile(shape, jnp.float32, axis=0)
        print(f"  sublane-gather {shape} f32: {r}")
    print("throughput:")
    for n in (16, 64, 256):
        gather_rate_kernel(n_gathers=n)
    for shape in [(8, 256), (8, 896)]:
        try:
            gather_rate_kernel(n_gathers=64, shape=shape)
        except Exception as e:  # noqa: BLE001
            print(f"  chained {shape}: FAIL {str(e).splitlines()[0][:80]}")
    xla_row_gather_baseline()
