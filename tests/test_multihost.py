"""Multi-host execution: 2 real processes x 4 CPU devices each,
bit-identical to the single-process engine (BASELINE.json config #5's
"N>=2 hosts" requirement, SURVEY.md §5 distributed backend).

Runs the tools/run_multihost.py launcher in --local fan-out mode so a
genuine jax.distributed job (coordination service, cross-process
collectives) is exercised without TPU hardware.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from util import REPO, make_jpeg, coef_arrays

LAUNCHER = os.path.join(REPO, "tools", "run_multihost.py")


@pytest.mark.slow
@pytest.mark.parametrize("color,quality", [(False, 3), (True, 5)])
def test_two_process_matches_single(tmp_path, color, quality):
    data = make_jpeg(128, 96, "photo", seed=31, color=color, quality=70)
    inp = tmp_path / "in.jpg"
    inp.write_bytes(data)
    out = tmp_path / "out.jpg"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)      # launcher sets cpu per process
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, LAUNCHER, "--local", "2",
         "--devices-per-host", "4", "-q", str(quality), "-n", "2",
         str(inp), str(out)],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()

    # single-process engine result
    from jpegqs_tpu import engine
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu.options import QsOptions
    img = jpegio.read_coefficients(data)
    want = engine._smooth_fused(img, QsOptions.from_quality(quality, 2))

    got = coef_arrays(out.read_bytes())
    for ci, (coefs, _q) in enumerate(got):
        ref = (want.upsampled[ci - 1] if want.upsampled is not None
               and ci >= 1 else want.coefs[ci])
        assert np.array_equal(coefs, ref), f"comp {ci}"


def test_distributed_stop_propagation_single_process():
    """smooth_jpeg_distributed (run single-process on the virtual mesh)
    mirrors the engine's crafted-file semantics: tripping component
    clamped, later components plain-dequantized, res.stop set."""
    import numpy as np
    from jpegqs_tpu import engine
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu.options import QsOptions
    from jpegqs_tpu.parallel.multihost import smooth_jpeg_distributed

    rng = np.random.default_rng(41)
    # synthetic 2-component non-YCbCr image fed in by stubbing
    # read_coefficients (no JPEG encoder produces this guard case)
    from jpegqs_tpu.host.jpegio import JpegImage, ComponentData
    qtbl = np.full(64, 64, np.uint16)
    coefs = rng.integers(-5, 6, (2, 8, 8, 64)).astype(np.int16)
    coefs[0, 0, 0, 3] = 1000
    img = JpegImage(width=64, height=64, jpeg_color_space=2,
                    progressive=False, max_h_samp_factor=1,
                    max_v_samp_factor=1)
    for ci in range(2):
        img.components.append(ComponentData(
            component_id=ci, h_samp_factor=1, v_samp_factor=1,
            quant_tbl_no=0, width_in_blocks=8, height_in_blocks=8,
            quantval=qtbl, coefs=coefs[ci].copy()))

    opts = QsOptions.from_quality(3, 2)
    want = engine._smooth_fused(img, opts)

    orig = jpegio.read_coefficients
    jpegio.read_coefficients = lambda data: img
    try:
        got, _ = smooth_jpeg_distributed(b"unused", opts)
    finally:
        jpegio.read_coefficients = orig
    assert got.stop == want.stop == 1
    for ci in range(2):
        assert np.array_equal(got.coefs[ci], want.coefs[ci]), f"comp {ci}"


@pytest.mark.slow
def test_two_process_col_grid_q6(tmp_path):
    """2 real processes x 4 devices on an image whose block rows (2
    luma / 1 chroma) can't split 8 ways: the job falls back to the
    (1 x 8) col grid and the cross-process col-axis ppermutes carry
    the halos — output identical to the single-process engine,
    upsampled planes included."""
    data = make_jpeg(16, 512, "photo", seed=37, color=True, quality=70)
    inp = tmp_path / "in.jpg"
    inp.write_bytes(data)
    out = tmp_path / "out.jpg"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, LAUNCHER, "--local", "2",
         "--devices-per-host", "4", "-q", "6", "-n", "2",
         str(inp), str(out)],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    from jpegqs_tpu import engine
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu.options import QsOptions
    img = jpegio.read_coefficients(data)
    want = engine._smooth_fused(img, QsOptions.from_quality(6, 2))

    got = coef_arrays(out.read_bytes())
    for ci, (coefs, _q) in enumerate(got):
        ref = (want.upsampled[ci - 1] if want.upsampled is not None
               and ci >= 1 else want.coefs[ci])
        assert np.array_equal(coefs, ref), f"comp {ci}"


def test_distributed_grid_fallback_single_process():
    """Block rows that don't divide the job's device count pick a
    (row x col) grid instead of failing — here hb=2 on 8 devices
    becomes a 2x4 mesh; output matches the single-device engine."""
    from jpegqs_tpu import engine
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu.options import QsOptions
    from jpegqs_tpu.parallel.multihost import smooth_jpeg_distributed

    data = make_jpeg(16, 512, "photo", seed=33, quality=70)
    img = jpegio.read_coefficients(data)
    opts = QsOptions.from_quality(3, 2)
    want = engine._smooth_fused(img, opts)
    got, _ = smooth_jpeg_distributed(data, opts)
    assert np.array_equal(got.coefs[0], want.coefs[0])


def test_distributed_ycbcr_col_grid_single_process():
    """The fused YCbCr color flow (JOINT+UPSAMPLE) rides the col axis
    when chroma has too few block rows for the job's devices."""
    from jpegqs_tpu import engine
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu.options import QsOptions
    from jpegqs_tpu.parallel.multihost import smooth_jpeg_distributed

    data = make_jpeg(16, 512, "photo", seed=34, color=True, quality=70)
    img = jpegio.read_coefficients(data)
    opts = QsOptions.from_quality(6, 2)
    want = engine._smooth_fused(img, opts)
    got, _ = smooth_jpeg_distributed(data, opts)
    for ci in range(3):
        assert np.array_equal(got.coefs[ci], want.coefs[ci]), f"comp {ci}"
    assert np.array_equal(got.upsampled[0], want.upsampled[0])
    assert np.array_equal(got.upsampled[1], want.upsampled[1])


def test_distributed_ycbcr_unequal_chroma_tables():
    """Distinct Cb/Cr quant tables run the fused distributed color
    path with per-component tables — bit-identical to the engine
    (each chroma pass gets its own quant/interval tables)."""
    import numpy as np
    from jpegqs_tpu import engine
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu.host.jpegio import JpegImage, ComponentData
    from jpegqs_tpu.options import QsOptions
    from jpegqs_tpu.parallel.multihost import smooth_jpeg_distributed

    rng = np.random.default_rng(42)
    img = JpegImage(width=128, height=128, jpeg_color_space=3,
                    progressive=False, max_h_samp_factor=2,
                    max_v_samp_factor=2)
    dims = ((16, 16, 2, 2), (8, 8, 1, 1), (8, 8, 1, 1))
    for ci, (hb, wb, hs, vs) in enumerate(dims):
        qt = np.full(64, 10 + 3 * ci, np.uint16)  # Cb != Cr tables
        img.components.append(ComponentData(
            component_id=ci, h_samp_factor=hs, v_samp_factor=vs,
            quant_tbl_no=min(ci, 1), width_in_blocks=wb,
            height_in_blocks=hb,
            quantval=qt,
            coefs=rng.integers(-5, 6, (hb, wb, 64)).astype(np.int16)))

    opts = QsOptions(flags=2 | 1, niter=2)
    want = engine._smooth_fused(img, opts)
    orig = jpegio.read_coefficients
    jpegio.read_coefficients = lambda data: img
    try:
        got, _ = smooth_jpeg_distributed(b"unused", opts)
    finally:
        jpegio.read_coefficients = orig
    for ci in range(3):
        assert np.array_equal(got.coefs[ci], want.coefs[ci]), f"comp {ci}"
