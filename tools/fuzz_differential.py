#!/usr/bin/env python
"""Randomized differential fuzz vs the scalar reference binary.

The structured test matrix (tests/) pins the known-interesting
configurations; this tool samples the whole input space — random
dimensions, content, colorspace, subsampling, source quality,
progressive/arithmetic/restart entropy coding, quality level, niter,
and raw ``--flags`` combinations — and asserts byte-exact output
coefficient planes against the scalar reference build for every case
(the same contract as tests/test_engine.py::assert_matches_reference).

Every case is seeded and its parameters are printed, so a mismatch is
a one-line repro.  Run length is bounded by --cases (each new
geometry compiles a fresh XLA program on CPU, ~10-40 s cold, cached
afterwards).

Usage: python tools/fuzz_differential.py [--cases N] [--seed S]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms",
                  os.environ.get("JPEGQS_TEST_PLATFORM", "cpu"))

from jpegqs_tpu.utils import cache as _qs_cache

_qs_cache.setup(os.path.join(REPO, ".jax_cache"))

import numpy as np

from util import make_jpeg, run_reference, coef_arrays
from jpegqs_tpu import engine
from jpegqs_tpu.host import jpegio
from jpegqs_tpu.options import QsOptions


def sample_case(rng):
    """One random configuration (all fields JSON-printable)."""
    case = {
        "h": int(rng.integers(8, 230)),
        "w": int(rng.integers(8, 230)),
        "kind": str(rng.choice(["photo", "edges", "flat", "noise"])),
        "color": str(rng.choice(["gray", "color", "cmyk"],
                                p=[0.3, 0.55, 0.15])),
        "srcq": int(rng.integers(12, 97)),
        "progressive": bool(rng.random() < 0.15),
        "arith": bool(rng.random() < 0.10),
        "restart": int(rng.choice([0, 0, 0, 1, 3, 7])),
        "quality": int(rng.integers(0, 7)),
        "niter": int(rng.choice([0, 1, 2, 3, 4, 5, 8])),
        "flags": None,
    }
    case["subsamp"] = (int(rng.choice([0, 1, 2, 3, 4, 5]))
                       if case["color"] == "color" else 1)
    if rng.random() < 0.25:
        # raw --flags override: algorithm bits 0-5 (DIAGONALS,
        # JOINT_YUV, UPSAMPLE_UV, LOW_QUALITY, NO_REBALANCE,
        # NO_REBALANCE_UV — libjpegqs.h:14-32)
        case["flags"] = int(rng.integers(0, 64))
        case["niter"] = int(rng.choice([0, 1, 2, 3]))
    return case


def run_case(case):
    data = make_jpeg(case["h"], case["w"], case["kind"],
                     seed=(case["h"] * 997 + case["w"]),
                     color=(False if case["color"] == "gray"
                            else ("cmyk" if case["color"] == "cmyk"
                                  else True)),
                     quality=case["srcq"], subsamp=case["subsamp"],
                     progressive=case["progressive"],
                     arith=case["arith"],
                     restart_interval=case["restart"])
    if case["flags"] is None:
        ref = run_reference(data, quality=case["quality"],
                            niter=case["niter"])
        opts = QsOptions.from_quality(case["quality"], case["niter"])
    else:
        ref = run_reference(data, quality=3, niter=case["niter"],
                            extra_args=("-f", str(case["flags"])))
        opts = QsOptions(flags=case["flags"], niter=case["niter"])
    ref_coefs = coef_arrays(ref)
    img = jpegio.read_coefficients(data)
    res = engine.smooth(img, opts)
    if res.upsampled is not None:
        ours = [res.coefs[0], res.upsampled[0], res.upsampled[1]]
    else:
        ours = res.coefs
    for ci in range(len(img.components)):
        want = ref_coefs[ci][0]
        got = ours[ci]
        assert got.shape == want.shape, f"component {ci} shape"
        if not np.array_equal(got, want):
            bad = np.argwhere(got != want)
            t = tuple(bad[0])
            raise AssertionError(
                f"component {ci}: {len(bad)} mismatches, first {t}: "
                f"got {got[t]} want {want[t]}")
    return data


def check_corpus(rng, datas_opts):
    """smooth_many must equal per-image smooth_jpeg_bytes outputs."""
    from jpegqs_tpu import smooth_jpeg_bytes, smooth_many
    datas = [d for d, _ in datas_opts]
    opts = QsOptions.from_quality(3, 2)
    batched = smooth_many(datas, opts, workers=4)
    for i, d in enumerate(datas):
        want = coef_arrays(smooth_jpeg_bytes(d, opts))
        got = coef_arrays(batched[i])
        for (gc, _), (wc, _) in zip(got, want):
            assert np.array_equal(gc, wc), f"corpus image {i}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--corpus-every", type=int, default=12,
                    help="run a corpus-equivalence check every N cases")
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    recent = []
    t00 = time.time()
    for i in range(args.cases):
        case = sample_case(rng)
        t0 = time.time()
        try:
            data = run_case(case)
            recent.append((data, case))
            del recent[:-4]
        except Exception:
            print(f"[{i}] FAIL {case}", flush=True)
            raise
        print(f"[{i}] ok {time.time() - t0:5.1f}s {case}", flush=True)
        if (i + 1) % 25 == 0:
            # every case compiles a fresh program; hundreds of live
            # executables exhaust vm.max_map_count (65530 default) and
            # XLA:CPU starts failing mmaps ("LLVM compilation error:
            # Cannot allocate memory" — or segfaults mid-deserialize).
            # Dropping the in-process caches unmaps them; the
            # persistent cache makes reloads cheap.
            import gc
            jax.clear_caches()
            gc.collect()
        if args.corpus_every and (i + 1) % args.corpus_every == 0 \
                and len(recent) >= 3:
            t0 = time.time()
            check_corpus(rng, recent)
            print(f"[{i}] corpus-equivalence ok "
                  f"{time.time() - t0:5.1f}s ({len(recent)} images)",
                  flush=True)
    print(f"ALL {args.cases} CASES BIT-EXACT "
          f"({(time.time() - t00) / 60:.1f} min, seed {args.seed})")


if __name__ == "__main__":
    main()
