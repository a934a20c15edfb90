#!/usr/bin/env python
"""Corpus throughput demo: smooth_many over N images, end to end
(JPEG bytes in -> smoothed JPEG bytes out), vs the reference CLI
processing the same files with all cores.

    python tools/throughput_demo.py [n_images] [quality] [workers]
"""

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    quality = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    from jpegqs_tpu.utils import cache as _qs_cache
    _qs_cache.setup(os.path.join(REPO, ".jax_cache"))

    from util import make_jpeg
    from jpegqs_tpu import smooth_many, QsOptions

    h, w = 1024, 1024
    print(f"corpus: {n} x {w}x{h} ({n * w * h / 1e6:.0f} MP), "
          f"q{quality} n3, {workers} workers")
    datas = [make_jpeg(h, w, "photo", seed=s, quality=70) for s in range(n)]
    opts = QsOptions.from_quality(quality, 3)

    smooth_many(datas[:2], opts, workers=workers)  # warm compiles
    t0 = time.perf_counter()
    outs = smooth_many(datas, opts, workers=workers)
    dt = time.perf_counter() - t0
    mp = n * w * h / 1e6
    print(f"smooth_many: {dt:.2f}s -> {n / dt:.2f} images/s, "
          f"{mp / dt:.1f} MP/s end-to-end (tunnel transfers included)")

    # uniform corpus: one device program for the whole batch
    from jpegqs_tpu import smooth_image_batch
    from jpegqs_tpu.host import jpegio
    imgs = [jpegio.read_coefficients(d) for d in datas]
    smooth_image_batch(imgs[:2], opts)  # warm
    t0 = time.perf_counter()
    smooth_image_batch(imgs, opts)
    bt = time.perf_counter() - t0
    print(f"smooth_image_batch (1 program, decode excluded): {bt:.2f}s -> "
          f"{n / bt:.2f} images/s, {mp / bt:.1f} MP/s")

    # mixed corpus: bucketed pipeline vs strict per-image sequential
    from jpegqs_tpu import smooth_jpeg_bytes
    mixed = []
    for s in range(n):
        hh, ww = (1024, 1024) if s % 3 else (768, 1280)
        mixed.append(make_jpeg(hh, ww, "photo", seed=s, color=s % 2 == 0,
                               quality=70 if s % 3 else 60))
    mmp = sum((1024 * 1024 if s % 3 else 768 * 1280)
              for s in range(n)) / 1e6
    t0 = time.perf_counter()
    smooth_many(mixed, opts, workers=workers)   # compiles bucket programs
    ct = time.perf_counter() - t0
    t0 = time.perf_counter()
    smooth_many(mixed, opts, workers=workers)
    mt = time.perf_counter() - t0
    for d in mixed:                    # compile per-image configs
        smooth_jpeg_bytes(d, opts)
    t0 = time.perf_counter()
    for d in mixed:
        smooth_jpeg_bytes(d, opts)
    st = time.perf_counter() - t0
    print(f"mixed corpus ({n} imgs, {mmp:.0f} MP), steady state: "
          f"pipeline {mt:.2f}s ({mmp / mt:.1f} MP/s; first run incl. "
          f"compiles {ct:.2f}s) vs per-image {st:.2f}s "
          f"({mmp / st:.1f} MP/s) -> {st / mt:.2f}x")

    ref = os.path.join(REPO, ".ref", "jpegqs_native")
    if os.path.exists(ref):
        with tempfile.TemporaryDirectory() as d:
            paths = []
            for i, data in enumerate(datas):
                p = os.path.join(d, f"{i}.jpg")
                with open(p, "wb") as f:
                    f.write(data)
                paths.append(p)
            t0 = time.perf_counter()
            procs = []
            for i, p in enumerate(paths):
                procs.append(subprocess.Popen(
                    [ref, "-q", str(quality), "-n", "3", "-i", "0", p,
                     os.path.join(d, f"o{i}.jpg")]))
                # keep at most nproc children in flight
                if len(procs) >= os.cpu_count():
                    procs.pop(0).wait()
            for pr in procs:
                pr.wait()
            rt = time.perf_counter() - t0
        print(f"reference CLI (all cores): {rt:.2f}s -> "
              f"{n / rt:.2f} images/s, {mp / rt:.1f} MP/s end-to-end")
        print(f"speedup: {rt / dt:.2f}x")


if __name__ == "__main__":
    main()
