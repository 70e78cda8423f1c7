"""Host input-pipeline benchmark: native C++ data service vs Python BatchLoader.

Generates a KITTI-shaped prepared set (stacked 3x370x1226 PNGs -- the raw
KITTI camera resolution -- resized to the training 256x832), then measures
end-to-end loader throughput in frames/sec for both implementations, cold
(every batch decodes) and hot (decode cache covers the set).

Usage: python scripts/bench_loader.py [--dir /tmp/bench_loader] [--n 24]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unsupervised_depth_opticalflow_egomotion_tpu.data import (  # noqa: E402
    BatchLoader,
    KittiPreparedDataset,
    NativeBatchLoader,
    native_loader,
)


def make_set(root: str, n: int, hw=(370, 1226)) -> None:
    import cv2

    os.makedirs(root, exist_ok=True)
    if os.path.exists(os.path.join(root, "train.txt")):
        return
    rng = np.random.RandomState(0)
    h, w = hw
    with open(os.path.join(root, "calib.txt"), "w") as f:
        f.write(
            "P_rect_02: 721.5 0.0 609.6 0.0 0.0 721.5 172.9 0.0 0.0 0.0 1.0 0.0\n"
        )
    lines = []
    base = rng.randint(0, 255, (3 * h, w, 3), np.uint8)
    for i in range(n):
        img = np.roll(base, i * 7, axis=1)  # distinct, same entropy
        cv2.imwrite(os.path.join(root, f"{i:06d}.png"), img)
        lines.append(f"{i:06d}.png calib.txt\n")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.writelines(lines)


def run(loader, n_batches: int, batch: int) -> float:
    t0 = time.time()
    seen = 0
    for b in loader:
        b[0].sum()  # touch the buffer like a consumer would
        seen += 1
        if seen >= n_batches:
            break
    dt = time.time() - t0
    return seen * batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/bench_loader")
    ap.add_argument("--n", type=int, default=24, help="distinct stacks")
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    args = ap.parse_args()

    make_set(args.dir, args.n)
    mk = lambda cache: KittiPreparedDataset(
        args.dir, num_scales=3, img_hw=(256, 832),
        num_iterations=args.batches * args.batch, seed=0,
        uint8_images=True, cache_decoded_bytes=cache,
    )
    results = {}
    for cache, tag in [(0, "cold"), (1 << 31, "hot")]:
        py = BatchLoader(mk(cache), args.batch, num_workers=args.workers, seed=0)
        results[f"python_{tag}"] = run(py, args.batches, args.batch)
        if native_loader.load_lib() is not None:
            nat = NativeBatchLoader(
                mk(cache), args.batch, num_workers=args.workers,
                prefetch=4, seed=0,
            )
            results[f"native_{tag}"] = run(nat, args.batches, args.batch)

    for k, v in results.items():
        print(f"{k:14s} {v:8.1f} frames/s")
    if "native_cold" in results:
        print(
            f"native/python: cold {results['native_cold']/results['python_cold']:.2f}x"
            f"  hot {results['native_hot']/results['python_hot']:.2f}x"
        )


if __name__ == "__main__":
    main()
