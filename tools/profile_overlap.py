#!/usr/bin/env python
"""Cost of the exchange/compute overlap split on real TPU (1 chip).

The JPEGQS_OVERLAP=1 structure splits every sharded resident pass into
interior-tile and boundary-tile kernel invocations so the halo
ppermute carries no data dependency on the interior compute
(sharded._sharded_resident_iters; SURVEY §5 "collectives overlapped
with the per-iteration Pallas kernel").  What the split COSTS is
measurable on one chip: a 1-device mesh runs the full split structure
(3 pallas calls + output concats per iteration) with the exchange
compiled out, so

    T_split(n3) - T_split(n1)   vs   T_plain(n3) - T_plain(n1)

isolates the split's per-iteration overhead.  What the split would
HIDE is bounded analytically: the per-boundary exchange payload is
2 x 8 pixel lines x wb int32 (KBs), microseconds on ICI against
milliseconds of per-iteration kernel — so the overlap is default-off
unless this measurement says the split is ~free.

Usage: PYTHONPATH=/root/.axon_site python tools/profile_overlap.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax
from jpegqs_tpu.utils import cache as _qs_cache
_qs_cache.setup(os.path.join(REPO, ".jax_cache"))
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from jpegqs_tpu.ops.quant import make_quant_tables
from jpegqs_tpu.parallel import sharded as _sh

K2, KP = 30, 3          # chained calls per measurement
ROUNDS = 5


def make_coef(hb, wb, qtbl, seed):
    rng = np.random.default_rng(seed)
    cap = 2047 // np.maximum(qtbl, 1)
    c = (rng.integers(-40, 41, (hb * wb, 64))
         // (1 + np.arange(64) // 8))
    return np.clip(c, -cap[None, :], cap[None, :]).astype(np.int16)


def chain(run, k):
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = run()
    _ = np.asarray(out[(0,) * out.ndim])
    return (time.perf_counter() - t0) / k


def main():
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("row",))
    qtbl = np.clip(np.arange(1, 65, dtype=np.int32) % 23 + 4, 4, 60)
    tabs = tuple(map(jnp.asarray, (qtbl,) + make_quant_tables(qtbl)))
    print(f"backend={jax.default_backend()}  "
          f"overlap env={os.environ.get('JPEGQS_OVERLAP')}")

    for label, (hb, wb), k in (("2.1MP", (180, 182), K2),
                               ("100MP", (884, 1768), KP)):
        coef = jnp.asarray(make_coef(hb, wb, qtbl, 3).reshape(hb, wb, 64))
        runs = {}
        for mode in ("plain", "split"):
            os.environ["JPEGQS_OVERLAP"] = "1" if mode == "split" else "0"
            for niter in (1, 3):
                fn = _sh.make_sharded_smooth(
                    mesh1, hb=hb, wb=wb, flags=0, niter=niter, luma=True)
                run = lambda fn=fn: fn(coef, *tabs)[0]
                run()                      # trace+compile under the env
                runs[(mode, niter)] = run
        os.environ["JPEGQS_OVERLAP"] = "0"
        # interleave all four within each round to cancel tunnel drift
        iters = {"plain": [], "split": []}
        for _ in range(ROUNDS):
            t = {key: chain(run, k) for key, run in runs.items()}
            for m in ("plain", "split"):
                iters[m].append((t[(m, 3)] - t[(m, 1)]) / 2)
        med = {m: sorted(v)[len(v) // 2] for m, v in iters.items()}
        pct = (med["split"] / med["plain"] - 1) * 100
        print(f"{label}: per-iteration plain {med['plain']*1e3:7.2f} ms  "
              f"split {med['split']*1e3:7.2f} ms  -> split cost "
              f"{pct:+.1f}%")
        print(f"{label}: exchange payload per boundary/iter "
              f"{2 * 8 * wb * 4 / 1024:.1f} KB "
              f"(~{2 * 8 * wb * 4 / 45e9 * 1e6:.1f} us at 45 GB/s ICI; "
              f"{2 * 8 * wb * 4 / 45e9 / med['plain'] * 100:.3f}% of an "
              f"iteration)")


if __name__ == "__main__":
    main()
