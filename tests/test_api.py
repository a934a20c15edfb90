"""Library API surface: progress/cancel, decode path, exports."""

import numpy as np
import pytest

import jpegqs_tpu
from jpegqs_tpu import engine
from jpegqs_tpu.host import jpegio
from jpegqs_tpu.options import QsOptions
from util import make_jpeg, run_reference, coef_arrays


def test_progress_callback_reference_cadence():
    """The callback fires with the reference's threshold-gated (cur,
    prog_prec) values (quantsmooth.h:2474-2482, 2652-2663); default
    progprec=0 means a 20-step scale.  The exact trace parity against
    the reference binary is pinned in tests/test_progress.py."""
    data = make_jpeg(48, 48, "photo", seed=2, color=True, quality=70,
                     subsamp=1)
    img = jpegio.read_coefficients(data)
    calls = []
    opts = QsOptions.from_quality(3, 3, userdata="tok",
                                  progress=lambda u, cur, n:
                                  calls.append((u, cur, n)) and 0)
    engine.smooth(img, opts)
    assert calls[0][0] == "tok"
    assert all(n == 20 for _, _, n in calls)
    assert [c for _, c, _ in calls] == [4, 8, 13, 14, 15, 16, 17, 18, 20]


def test_progress_cancel_gives_valid_output():
    """Cancel at the first callback: the current component keeps its
    completed iterations, remaining components fall back to plain
    dequantization (reference cancel semantics, quantsmooth.h:2663)."""
    data = make_jpeg(48, 48, "photo", seed=2, color=True, quality=70,
                     subsamp=1)
    img = jpegio.read_coefficients(data)
    opts = QsOptions.from_quality(3, 3,
                                  progress=lambda u, cur, n: 1)
    res = engine.smooth(img, opts)
    assert res.stop == 1
    # comp 0 canceled after its first iteration == 1-iter run
    one = engine.smooth(img, QsOptions.from_quality(3, 1))
    assert np.array_equal(res.coefs[0], one.coefs[0])
    # comps 1,2 = dequantized only
    for ci in (1, 2):
        c = img.components[ci]
        dq = (c.coefs.astype(np.int32)
              * c.quantval.astype(np.int32)[None, None, :]).astype(np.int16)
        assert np.array_equal(res.coefs[ci], dq)


def test_decode_smoothed_matches_reference_decode():
    data = make_jpeg(48, 56, "photo", seed=4, color=True, quality=70,
                     subsamp=1)
    ours = jpegs = jpegqs_tpu.decode_smoothed(
        data, QsOptions.from_quality(3, 3))
    assert ours.shape == (48, 56, 3) and ours.dtype == np.uint8
    ref_bytes = run_reference(data, 3, 3)
    ref_pix = jpegio.decode_pixels(ref_bytes)
    assert np.array_equal(ours, ref_pix)


def test_public_exports():
    for name in jpegqs_tpu.__all__:
        assert hasattr(jpegqs_tpu, name), name


def test_example_frontend(tmp_path):
    """examples/example.py (the example.c port: decode-smoothed ->
    BMP with a progress callback) runs end to end."""
    import os
    import struct
    import subprocess
    import sys as _sys

    from util import REPO
    data = make_jpeg(24, 40, "photo", seed=6, color=True, quality=75)
    inp = tmp_path / "in.jpg"
    inp.write_bytes(data)
    out = tmp_path / "out.bmp"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # share the persistent compile cache: without it the subprocess
    # recompiles its program every run, and a cold compile under a
    # concurrently compiling test suite can blow the timeout.  Routed
    # through utils.cache.setup (JPEGQS_CACHE_DIR) so the subprocess
    # uses the per-machine subdir + zlib codec, not the flat dir.
    env["JPEGQS_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    r = subprocess.run(
        [_sys.executable, os.path.join(REPO, "examples", "example.py"),
         str(inp), str(out), "0", "1"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    blob = out.read_bytes()
    assert blob[:2] == b"BM"
    w, h = struct.unpack_from("<ii", blob, 18)
    assert (w, h) == (40, 24)


@pytest.mark.parametrize("h,w,color,subsamp,quality,native", [
    (103, 97, False, 1, 3, True),    # gray, odd dims
    (50, 42, True, 1, 3, True),      # 4:2:0, odd chroma crops
    (48, 56, True, 1, 6, True),      # UPSAMPLE_UV output (1x1 comps)
    (50, 42, True, 2, 5, True),      # 4:2:2 h2v1 fancy
    (40, 40, True, 0, 5, True),      # 4:4:4, no upsampling
    (48, 40, True, 3, 3, False),     # 4:4:0 -> re-encode fallback
])
def test_decode_smoothed_native_vs_reencode(h, w, color, subsamp,
                                            quality, native):
    """The re-encode-free device decode (ops/colorout.py) is
    byte-identical to libjpeg's decode of the re-encoded file — IDCT,
    fancy upsampling edge cases (odd dims) and the fixed-point
    YCbCr->RGB all match (jidctint.c / jdsample.c / jdcolor.c)."""
    data = make_jpeg(h, w, "photo", seed=9, color=color, quality=70,
                     subsamp=subsamp)
    opts = QsOptions.from_quality(quality, 2)
    img = jpegio.read_coefficients(data)
    res = engine.smooth(img, opts)
    got = engine._decode_native(img, res)
    if not native:
        assert got is None
        got = jpegqs_tpu.decode_smoothed(data, opts)
    want = jpegio.decode_pixels(engine._save_result(data, res))
    assert np.array_equal(got, want)
