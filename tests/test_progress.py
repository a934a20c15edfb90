"""Progress-callback semantics vs the reference, differentially.

The oracle is ``.ref/progress_harness`` — the reference do_quantsmooth
driven with a printing progress callback (tools/progress_harness.c).
Pins the exact (cur, max) sequences of quantsmooth.h:2474-2482 +
2652-2663 and the ``progprec`` semantics of libjpegqs.h:42-44.
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from util import REPO, ensure_reference, make_jpeg

from jpegqs_tpu import engine
from jpegqs_tpu.host import jpegio
from jpegqs_tpu.options import QsOptions

HARNESS = os.path.join(REPO, ".ref", "progress_harness")


def ref_trace(data: bytes, flags: int, niter: int, progprec: int,
              cancel_after: int = 0):
    ensure_reference()
    with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
        f.write(data)
        f.flush()
        r = subprocess.run(
            [HARNESS, f.name, str(flags), str(niter), str(progprec),
             str(cancel_after)],
            capture_output=True, text=True, check=True)
    out = []
    for line in r.stdout.splitlines():
        if line.startswith("P "):
            _, cur, mx = line.split()
            out.append((int(cur), int(mx)))
    return out


def our_trace(data: bytes, flags: int, niter: int, progprec: int,
              cancel_after: int = 0):
    img = jpegio.read_coefficients(data)
    calls = []

    def cb(userdata, cur, mx):
        calls.append((cur, mx))
        return cancel_after and len(calls) >= cancel_after

    engine.smooth(img, QsOptions(flags=flags, niter=niter,
                                 progprec=progprec, progress=cb))
    return calls


@pytest.mark.parametrize("flags,niter,progprec", [
    (3, 3, 0),      # default precision (20)
    (1, 3, 0),
    (1, 2, 5),      # coarse
    (3, 1, 100),    # finer than the iteration count can deliver
    (1, 3, -1),     # max resolution
])
def test_progress_trace_matches_reference(flags, niter, progprec):
    data = make_jpeg(120, 112, "photo", seed=6, color=True, quality=70,
                     subsamp=1)
    assert our_trace(data, flags, niter, progprec) == \
        ref_trace(data, flags, niter, progprec)


def test_progress_trace_gray():
    data = make_jpeg(96, 104, "photo", seed=8, quality=75)
    assert our_trace(data, 1, 3, 0) == ref_trace(data, 1, 3, 0)


def test_progress_cancel_trace_and_output():
    """Cancel at the first callback: same truncated trace, the current
    component keeps its completed iterations, later components are
    dequant-only (quantsmooth.h:2663-2665 break + 2551-2566)."""
    data = make_jpeg(120, 112, "photo", seed=6, color=True, quality=70,
                     subsamp=1)
    assert our_trace(data, 3, 3, 0, cancel_after=1) == \
        ref_trace(data, 3, 3, 0, cancel_after=1)

    img = jpegio.read_coefficients(data)
    res = engine.smooth(img, QsOptions(
        flags=3, niter=3, progress=lambda u, c, m: 1))
    assert res.stop == 1
    # luma: canceled after iteration 1 == a clean 1-iteration run
    one = engine.smooth(img, QsOptions(flags=3, niter=1))
    assert np.array_equal(res.coefs[0], one.coefs[0])
    # chroma: dequantized only
    for ci in (1, 2):
        c = img.components[ci]
        dq = (c.coefs.astype(np.int32)
              * c.quantval.astype(np.int32)[None, None, :]).astype(np.int16)
        assert np.array_equal(res.coefs[ci], dq)


def _patch_dqt_to_one(data: bytes, table_id: int = 0) -> bytes:
    """Overwrite one DQT table's entries with 1 in the JPEG bytestream,
    making that component 'already processed' (val <= 1,
    quantsmooth.h:2500-2501) while others still smooth."""
    b = bytearray(data)
    i = 2
    while i < len(b) - 3:
        if b[i] != 0xFF:
            break
        m = b[i + 1]
        if m == 0xD8:
            i += 2
            continue
        if m == 0xDA:
            break
        ln = (b[i + 2] << 8) | b[i + 3]
        if m == 0xDB:
            j = i + 4
            end = i + 2 + ln
            while j < end:
                pq, tq = b[j] >> 4, b[j] & 15
                n = 64 * (2 if pq else 1)
                if tq == table_id:
                    for k in range(64):
                        if pq:
                            b[j + 1 + 2 * k] = 0
                            b[j + 2 + 2 * k] = 1
                        else:
                            b[j + 1 + k] = 1
                j += 1 + n
        i += 2 + ln
    return bytes(b)


@pytest.mark.parametrize("flags", [1, 3])
def test_progress_skipped_component_share(flags):
    """A skipped component (all-1 quant table -> num_iter2 = 0) still
    contributes its share to the progress numerator: the reference
    advances prog_next unconditionally at the top of every component
    (quantsmooth.h:2487-2492), so later components report from that
    offset."""
    data = make_jpeg(120, 112, "photo", seed=6, color=True, quality=70,
                     subsamp=1)
    data = _patch_dqt_to_one(data)   # luma table -> all 1
    assert our_trace(data, flags, 3, 0) == ref_trace(data, flags, 3, 0)


# ---------------------------------------------------------------------------
# PRECISE_PROGRESS (-DPRECISE_PROGRESS build): per-block-row counter
# (quantsmooth.h:2632-2665), opts.precise=True on our side
# ---------------------------------------------------------------------------

HARNESS_PRECISE = os.path.join(REPO, ".ref", "progress_harness_precise")


def ref_trace_precise(data, flags, niter, progprec, cancel_after=0,
                      out_path=None):
    ensure_reference()
    with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
        f.write(data)
        f.flush()
        args = [HARNESS_PRECISE, f.name, str(flags), str(niter),
                str(progprec), str(cancel_after)]
        if out_path:
            args.append(out_path)
        r = subprocess.run(args, capture_output=True, text=True,
                           check=True)
    out = []
    for line in r.stdout.splitlines():
        if line.startswith("P "):
            _, cur, mx = line.split()
            out.append((int(cur), int(mx)))
    return out


def our_trace_precise(data, flags, niter, progprec, cancel_after=0):
    img = jpegio.read_coefficients(data)
    calls = []

    def cb(userdata, cur, mx):
        calls.append((cur, mx))
        return cancel_after and len(calls) >= cancel_after

    res = engine.smooth(img, QsOptions(flags=flags, niter=niter,
                                       progprec=progprec, progress=cb,
                                       precise=True))
    return calls, res


@pytest.mark.parametrize("flags,niter,progprec", [
    (1, 2, 0),      # default precision (20): sub-iteration crossings
    (3, 2, 7),
    (1, 1, 50),     # much finer than iterations can deliver alone
    (1, 2, -1),     # max resolution: one callback per block row
])
def test_precise_progress_trace(flags, niter, progprec):
    data = make_jpeg(120, 112, "photo", seed=6, color=True, quality=70,
                     subsamp=1)
    got, _ = our_trace_precise(data, flags, niter, progprec)
    assert got == ref_trace_precise(data, flags, niter, progprec)


def test_precise_progress_trace_gray():
    data = make_jpeg(96, 104, "photo", seed=8, quality=75)
    got, _ = our_trace_precise(data, 1, 2, 0)
    assert got == ref_trace_precise(data, 1, 2, 0)


@pytest.mark.parametrize("cancel_after", [1, 3])
def test_precise_cancel_mid_iteration_state(tmp_path, cancel_after):
    """Cancel mid-iteration: the trace AND the partially-updated
    coefficient planes (rows before the cancel row carry the new
    iteration, rows after keep the previous one) match the reference's
    row-granular stop (quantsmooth.h:2632-2665 `if (stop) continue`
    + the always-run final clamp 2668-2689)."""
    from util import coef_arrays

    data = make_jpeg(96, 104, "photo", seed=12, quality=75)
    out = str(tmp_path / "ref_cancel.jpg")
    # flags | 64 (TRANSCODE) keeps the harness off the scanline-decode
    # reinit path; the algorithm bits are unaffected
    want_trace = ref_trace_precise(data, 1 | 64, 3, 0,
                                   cancel_after=cancel_after,
                                   out_path=out)
    want = coef_arrays(open(out, "rb").read())
    got_trace, res = our_trace_precise(data, 1, 3, 0,
                                       cancel_after=cancel_after)
    assert got_trace == want_trace
    assert res.stop == 1
    assert np.array_equal(
        res.coefs[0].reshape(want[0][0].shape), want[0][0])
