#!/usr/bin/env python
"""Host bench: scalar vs AVX2 resize in the native data service.

Times kds_decode_one (decode + split + 3x resize + pack) on a KITTI-raw-
sized stacked frame (3x370 x 1224 -> 3 thirds resized to 256x832) with the
resize forced scalar vs the AVX2 path (kds_set_scalar). The two paths are
bit-identical (tests/test_native_loader.py::test_avx2_scalar_bit_parity);
the delta is pure resize time. PNG and JPEG arms separate the zlib/huffman
decode share from the resize share.

Run: python scripts/bench_native_resize.py  (host-only, no TPU)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2  # noqa: E402

from unsupervised_depth_opticalflow_egomotion_tpu.data import (  # noqa: E402
    native_loader,
)

ITERS = int(os.environ.get("ITERS", "20"))


def timeit(path, hw, iters=ITERS):
    native_loader.decode_one(path, hw)  # warm page cache
    t = time.perf_counter()
    for _ in range(iters):
        native_loader.decode_one(path, hw)
    return (time.perf_counter() - t) / iters * 1e3


def main():
    if native_loader.load_lib() is None:
        print("native data service unavailable")
        return
    rng = np.random.RandomState(0)
    # KITTI raw 1224x370 three-frame stack; natural-image-ish content so the
    # PNG arm's zlib share is realistic (pure noise would understate it)
    base = rng.randint(0, 255, (3 * 370, 1224, 3)).astype(np.float32)
    img = cv2.GaussianBlur(base, (0, 0), 3).astype(np.uint8)
    png = "/tmp/bench_resize_stack.png"
    jpg = "/tmp/bench_resize_stack.jpg"
    cv2.imwrite(png, img)
    cv2.imwrite(jpg, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    hw = (256, 832)

    rows = []
    for name, path in [("png", png), ("jpeg", jpg)]:
        native_loader.set_scalar_resize(True)
        t_scalar = timeit(path, hw)
        native_loader.set_scalar_resize(False)
        t_avx2 = timeit(path, hw)
        rows.append((name, t_scalar, t_avx2))
    # cv2 reference: its own (SIMD) INTER_LINEAR on the same split/resize
    raw = cv2.imread(png)
    t = time.perf_counter()
    for _ in range(ITERS):
        for i in range(3):
            cv2.resize(raw[i * 370 : (i + 1) * 370], (832, 256))
    t_cv2_resize = (time.perf_counter() - t) / ITERS * 1e3

    print(f"{'arm':8} {'scalar ms':>10} {'avx2 ms':>9} {'speedup':>8}")
    for name, ts, ta in rows:
        print(f"{name:8} {ts:10.2f} {ta:9.2f} {ts / ta:7.2f}x")
    d = rows[0][1] - rows[1][1], rows[0][2] - rows[1][2]
    print(f"\nimplied resize-only (png-jpeg decode delta aside): "
          f"scalar {rows[1][1]:.2f} ms vs avx2 {rows[1][2]:.2f} ms per stack "
          f"(jpeg arm, decode share included)")
    print(f"cv2 3x resize only (no decode): {t_cv2_resize:.2f} ms")


if __name__ == "__main__":
    main()
