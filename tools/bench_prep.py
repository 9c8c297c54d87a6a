#!/usr/bin/env python
"""Host data-prep micro-benchmark: native C++ executor vs per-sample native vs PIL.

The reference preps each frame in Python DataLoader workers (PIL decode →
bicubic resize → BGR flip + normalize, reference
framework/dataset/segmentation_db.py:82-99); here the same byte-exact pipeline
runs in a persistent C++ worker pool (onda_tpu/native/dataprep.cpp). This tool
measures all three paths on synthetic PNGs at the real working resolution so
deployment claims ("host prep scales with cores") are backed by a number on the
machine at hand.

    python tools/bench_prep.py [--n 32] [--res 1024 512] [--src-res 2048 1024]

Prints one line per path: images/sec (and the per-image milliseconds).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)


def make_pngs(root: str, n: int, size_wh) -> list[str]:
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    w, h = size_wh
    for i in range(n):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        p = os.path.join(root, f"img_{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def bench(label: str, fn, n_images: int, repeats: int = 3) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    ips = n_images / best
    print(f"{label:>28}: {ips:7.1f} images/s  ({1e3 * best / n_images:6.1f} ms/img)")
    return ips


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32, help="images per measurement")
    ap.add_argument("--res", type=int, nargs=2, default=(1024, 512),
                    help="output W H (the reference working point)")
    ap.add_argument("--src-res", type=int, nargs=2, default=(2048, 1024),
                    help="source PNG W H (Cityscapes frames are 2048x1024)")
    args = ap.parse_args()

    from onda_tpu import native
    from onda_tpu.data.segmentation import load_image, normalize_image

    w, h = args.res
    with tempfile.TemporaryDirectory() as root:
        paths = make_pngs(root, args.n, tuple(args.src_res))
        print(f"# {args.n} PNGs {args.src_res[0]}x{args.src_res[1]} -> {w}x{h}, "
              f"{os.cpu_count()} host cores")

        from PIL import Image

        def pil_path():
            for p in paths:
                img = load_image(p, (w, h), Image.Resampling.BICUBIC, rgb=True)
                normalize_image(img, MEAN, STD)

        bench("PIL + numpy (reference path)", pil_path, args.n)

        if not native.available():
            print("native library unavailable — stopping after the PIL path")
            return

        def native_per_sample():
            for p in paths:
                native.prepare_image(p, (h, w), MEAN, STD, threads=1)

        bench("native per-sample (1 thread)", native_per_sample, args.n)

        executor = native.BatchExecutor()

        def native_executor():
            job, dst = executor.submit_images(paths, (h, w), MEAN, STD)
            assert executor.wait(job) == 0
            return dst

        bench("native executor (pool)", native_executor, args.n)


if __name__ == "__main__":
    main()
