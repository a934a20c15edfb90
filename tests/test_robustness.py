"""Crafted/damaged-input guards (reference: quantsmooth.h:2497-2511,
2596-2610, 2551-2566) — engine vs NumPy spec on synthetic components.
"""

import numpy as np

from jpegqs_tpu import engine, specref
from jpegqs_tpu.host.jpegio import JpegImage, ComponentData
from jpegqs_tpu.options import QsOptions


def _image(qtbl, coefs, ncomp=1):
    img = JpegImage(width=coefs.shape[1] * 8, height=coefs.shape[0] * 8,
                    jpeg_color_space=1 if ncomp == 1 else 3,
                    progressive=False, max_h_samp_factor=1,
                    max_v_samp_factor=1)
    for ci in range(ncomp):
        img.components.append(ComponentData(
            component_id=ci, h_samp_factor=1, v_samp_factor=1,
            quant_tbl_no=0, width_in_blocks=coefs.shape[1],
            height_in_blocks=coefs.shape[0],
            quantval=np.asarray(qtbl, np.uint16), coefs=coefs.copy()))
    return img


def _check(img, quality=3, niter=3):
    opts = QsOptions.from_quality(quality, niter)
    want = specref.do_quantsmooth(img, opts)
    got = engine.smooth(img, opts)
    assert got.stop == want.stop
    for ci in range(len(img.components)):
        assert np.array_equal(got.coefs[ci], want.coefs[ci]), f"comp {ci}"


def test_huge_quantizer_aborts():
    """q >= 0x800 -> stop, dequant-only output."""
    rng = np.random.default_rng(1)
    qtbl = rng.integers(1, 100, 64).astype(np.uint16)
    qtbl[5] = 0x900
    coefs = rng.integers(-10, 11, (6, 8, 64)).astype(np.int16)
    _check(_image(qtbl, coefs))


def test_coef_overflow_guard():
    """|coef*q| >= 0x800 during dequant -> badv, dequant-only output."""
    rng = np.random.default_rng(2)
    qtbl = np.full(64, 64, np.uint16)
    coefs = rng.integers(-5, 6, (6, 8, 64)).astype(np.int16)
    coefs[2, 3, 10] = 900  # 900*64 = 57600 >= 0x800 after wrap checks
    _check(_image(qtbl, coefs))


def test_zero_quantizer_repaired():
    """q == 0 entries are repaired to 1 (quantsmooth.h:2508-2511)."""
    rng = np.random.default_rng(3)
    qtbl = rng.integers(1, 60, 64).astype(np.uint16)
    qtbl[7] = 0
    coefs = rng.integers(-20, 21, (6, 8, 64)).astype(np.int16)
    _check(_image(qtbl, coefs))


def test_all_quant_one_skips_processing():
    """Already-processed file (all q == 1): output unchanged."""
    rng = np.random.default_rng(4)
    qtbl = np.ones(64, np.uint16)
    coefs = rng.integers(-200, 201, (6, 8, 64)).astype(np.int16)
    img = _image(qtbl, coefs)
    got = engine.smooth(img, QsOptions.from_quality(3, 3))
    assert np.array_equal(got.coefs[0], coefs)


def test_bad_second_component_stops_rest():
    """badv in comp 1 leaves comp 0 smoothed, comp 2 dequantized."""
    rng = np.random.default_rng(5)
    qtbl = np.full(64, 64, np.uint16)
    coefs = rng.integers(-5, 6, (3, 6, 8, 64)).astype(np.int16)
    coefs[1, 0, 0, 3] = 1000
    img = _image(qtbl, coefs[0], ncomp=1)
    img.jpeg_color_space = 3
    img.components = []
    for ci in range(3):
        img.components.append(ComponentData(
            component_id=ci, h_samp_factor=1, v_samp_factor=1,
            quant_tbl_no=0, width_in_blocks=8, height_in_blocks=6,
            quantval=qtbl, coefs=coefs[ci].copy()))
    _check(img)


def test_alloc_failure_degradation(monkeypatch):
    """Device allocation failure degrades to plain host-side
    dequantization and keeps going (reference: quantsmooth.h:2551-2566
    malloc-failure path) instead of propagating the exception."""
    from util import make_jpeg
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions

    data = make_jpeg(32, 32, "photo", seed=3, color=True, quality=70)
    img = jpegio.read_coefficients(data)

    def boom(*a, **k):
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory allocating 123 bytes")

    monkeypatch.setattr(engine, "_image_smooth_impl", boom)
    res = engine.smooth(img, QsOptions.from_quality(3, 3))
    assert res.stop == 0
    for ci, comp in enumerate(img.components):
        q = np.asarray(comp.quantval, np.int32)
        want = (np.asarray(comp.coefs, np.int16).astype(np.int32)
                * q.reshape(1, 1, 64)).astype(np.int16)
        assert np.array_equal(res.coefs[ci], want), f"comp {ci}"
    # non-OOM exceptions still propagate
    def other(*a, **k):
        raise RuntimeError("something else entirely")
    monkeypatch.setattr(engine, "_image_smooth_impl", other)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="something else"):
        engine.smooth(img, QsOptions.from_quality(3, 3))
