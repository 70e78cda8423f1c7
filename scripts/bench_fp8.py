#!/usr/bin/env python
"""Low-precision matmul microbench for the v5p/fp8 dossier (PERF.md).

Times ``dot_general`` at the geom step's dominant conv-as-matmul shapes in
bf16 / int8 / float8_e4m3fn on the attached chip. v5e has no fp8 MXU mode
(fp8 either fails to lower or runs at bf16 rate); int8 is the chip's native
2x-peak mode. The measured ratios calibrate the PERF.md v5p projection:
v5p quotes ~2.3x bf16 FLOPs over v5e, and fp8 on v5p-class parts rides the
int8 path's 2x.

Shapes: the depth_net encoder/decoder hot convs im2col'd (M = B*H*W of the
layer, K = 9*Cin or Cin, N = Cout), from the conv-shape table in PERF.md.

Run: python scripts/bench_fp8.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

# (label, M, K, N): im2col'd forms of the geom step's conv families
SHAPES = [
    ("stem 7x7s2 (128x416x64)", 8 * 128 * 416, 147, 64),
    ("enc l2 3x3 (32x104x128)", 8 * 32 * 104, 1152, 128),
    ("enc l3 3x3 (16x52x256)", 8 * 16 * 52, 2304, 256),
    ("dec 3x3 (64x208x64)", 8 * 64 * 208, 576, 64),
    ("pwc dense (32x104x96)", 8 * 32 * 104, 864, 96),
]


# (label, input NHWC, Cout, kernel, stride): the depth encoder's real conv
# shapes at b8 256x832 (3B-batched: the three snippet frames run as one
# 24-batch; depth_net.py ResNet18Encoder). These measure whether XLA lowers
# int8 convolutions at the chip's 2x int8 MXU rate directly -- the
# quantized-encoder lever of the v5p/int8 projection (PERF.md).
CONV_SHAPES = [
    ("stem 7x7s2 (24,256,832,3)->64", (24, 256, 832, 3), 64, 7, 2),
    ("enc l1 3x3 (24,64,208,64)", (24, 64, 208, 64), 64, 3, 1),
    ("enc l2 3x3 (24,32,104,128)", (24, 32, 104, 128), 128, 3, 1),
    ("enc l3 3x3 (24,16,52,256)", (24, 16, 52, 256), 256, 3, 1),
    ("enc l4 3x3 (24,8,26,512)", (24, 8, 26, 512), 512, 3, 1),
]

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _conv(x, k, stride, acc):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=DIMNUMS, preferred_element_type=acc,
    )


def bench_convs():
    """bf16 vs int8 convolution at the encoder shapes.

    Three arms per shape: bf16 (the production path), int8 with
    pre-quantized operands (the pure MXU-mode ceiling), and dq-int8 --
    bf16 input dynamically quantized (per-tensor absmax) -> int8 conv ->
    f32 rescale, the realistic quantized-encoder forward including its
    extra VPU/HBM passes.
    """
    rng = np.random.RandomState(1)
    for label, ishape, cout, ksz, stride in CONV_SHAPES:
        cin = ishape[-1]
        x_f = rng.randn(*ishape).astype(np.float32)
        k_f = (rng.randn(ksz, ksz, cin, cout) * 0.1).astype(np.float32)
        ho, wo = ishape[1] // stride, ishape[2] // stride
        flops = 2.0 * ishape[0] * ho * wo * ksz * ksz * cin * cout
        res = {"shape": label}

        xb = jnp.asarray(x_f).astype(jnp.bfloat16)
        kb = jnp.asarray(k_f).astype(jnp.bfloat16)
        f_bf16 = jax.jit(lambda a, b: _conv(a, b, stride, jnp.float32))
        t = _time(f_bf16, xb, kb)
        res["bf16"] = f"{flops / t / 1e12:.1f} TF/s ({t * 1e3:.3f} ms)"

        try:
            xi = jnp.asarray((x_f * 10).clip(-127, 127).astype(np.int8))
            ki = jnp.asarray((k_f * 100).clip(-127, 127).astype(np.int8))
            f_i8 = jax.jit(lambda a, b: _conv(a, b, stride, jnp.int32))
            t = _time(f_i8, xi, ki)
            res["int8"] = f"{flops / t / 1e12:.1f} TOP/s ({t * 1e3:.3f} ms)"
        except Exception as e:
            res["int8"] = f"UNSUPPORTED: {type(e).__name__}: {str(e)[:80]}"

        try:
            ki = jnp.asarray((k_f * 100).clip(-127, 127).astype(np.int8))

            def _dq(a, b):
                s = jnp.max(jnp.abs(a.astype(jnp.float32))) / 127.0
                aq = jnp.round(a.astype(jnp.float32) / s).astype(jnp.int8)
                y = _conv(aq, b, stride, jnp.int32)
                return y.astype(jnp.float32) * s

            t = _time(jax.jit(_dq), xb, ki)
            res["dq-int8"] = f"{flops / t / 1e12:.1f} TOP/s ({t * 1e3:.3f} ms)"
        except Exception as e:
            res["dq-int8"] = f"UNSUPPORTED: {type(e).__name__}: {str(e)[:80]}"
        print(res)


ITERS = int(os.environ.get("BENCH_FP8_ITERS", "30"))


def _time(fn, *args, iters=None):
    iters = ITERS if iters is None else iters
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out.astype(jnp.float32)))  # force through the relay
    t = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t) / iters


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    rows = []
    for label, m, k, n in SHAPES:
        a_f = rng.randn(m, k).astype(np.float32)
        b_f = rng.randn(k, n).astype(np.float32)
        flops = 2.0 * m * k * n
        res = {"shape": label, "MKN": (m, k, n)}
        for name, dt, acc in [
            ("bf16", jnp.bfloat16, jnp.float32),
            ("int8", jnp.int8, jnp.int32),
            ("fp8_e4m3", "float8_e4m3fn", jnp.float32),
        ]:
            try:
                dtype = jnp.dtype(dt)
                if name == "int8":
                    a = jnp.asarray((a_f * 10).clip(-127, 127).astype(np.int8))
                    b = jnp.asarray((b_f * 10).clip(-127, 127).astype(np.int8))
                else:
                    a = jnp.asarray(a_f).astype(dtype)
                    b = jnp.asarray(b_f).astype(dtype)

                f = jax.jit(
                    lambda x, y: jax.lax.dot_general(
                        x, y, (((1,), (0,)), ((), ())),
                        preferred_element_type=acc,
                    )
                )
                dt_s = _time(f, a, b)
                res[name] = f"{flops / dt_s / 1e12:.1f} TF/s ({dt_s * 1e3:.3f} ms)"
            except Exception as e:  # unsupported dtype / lowering failure
                res[name] = f"UNSUPPORTED: {type(e).__name__}: {str(e)[:80]}"
        rows.append(res)
        print(res)
    print()
    bench_convs()
    print("\nPeak v5e bf16 ~197 TF/s, int8 ~394 TOP/s.")


if __name__ == "__main__":
    main()
