"""Host JPEG coefficient I/O tests."""

import numpy as np
import pytest

from jpegqs_tpu.host import jpegio
from util import make_jpeg, synth_image


def test_encode_decode_roundtrip():
    img = synth_image(64, 48, "photo", seed=0)
    data = jpegio.encode_pixels(img, quality=90, subsamp=0)
    out = jpegio.decode_pixels(data)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 6


def test_coef_read_shapes_gray():
    data = make_jpeg(41, 53, "photo", seed=1)
    im = jpegio.read_coefficients(data)
    assert im.num_components == 1
    c = im.components[0]
    assert (c.height_in_blocks, c.width_in_blocks) == (6, 7)
    assert c.coefs.shape == (6, 7, 64)
    assert c.quantval.shape == (64,)
    assert c.quantval.min() >= 1


def test_coef_read_shapes_color_420():
    data = make_jpeg(48, 64, "photo", seed=2, color=True, subsamp=1)
    im = jpegio.read_coefficients(data)
    assert im.num_components == 3
    assert im.is_ycbcr
    y, cb, cr = im.components
    assert (y.h_samp_factor, y.v_samp_factor) == (2, 2)
    assert (cb.h_samp_factor, cb.v_samp_factor) == (1, 1)
    assert y.coefs.shape == (6, 8, 64)
    assert cb.coefs.shape == (3, 4, 64)
    assert cr.coefs.shape == (3, 4, 64)


def test_coef_write_roundtrip():
    data = make_jpeg(40, 40, "photo", seed=3, color=True, subsamp=1)
    with jpegio.JpegCoefFile(data) as f:
        im = f.read()
        mod = im.components[0].coefs.copy()
        mod[0, 0, 0] += 5
        f.write_coefs(0, mod)
        out = f.save(set_qtable_one=False)
    im2 = jpegio.read_coefficients(out)
    assert np.array_equal(im2.components[0].coefs, mod)
    assert np.array_equal(im2.components[1].coefs, im.components[1].coefs)


def test_save_qtable_one():
    data = make_jpeg(32, 32, "photo", seed=4)
    with jpegio.JpegCoefFile(data) as f:
        im = f.read()
        f.write_coefs(0, im.components[0].coefs)
        out = f.save(set_qtable_one=True)
    im2 = jpegio.read_coefficients(out)
    assert np.all(im2.components[0].quantval == 1)


def test_upsample_write():
    data = make_jpeg(32, 32, "photo", seed=5, color=True, subsamp=1)
    with jpegio.JpegCoefFile(data) as f:
        im = f.read()
        hb = im.components[0].height_in_blocks
        wb = im.components[0].width_in_blocks
        cb = np.zeros((hb, wb, 64), np.int16)
        cr = np.zeros((hb, wb, 64), np.int16)
        cb[..., 0] = 7
        cr[..., 0] = -7
        f.set_upsampled(cb, cr)
        f.write_coefs(0, im.components[0].coefs)
        out = f.save()
    im2 = jpegio.read_coefficients(out)
    assert im2.components[1].coefs.shape == (hb, wb, 64)
    assert im2.components[1].h_samp_factor == 1
    assert im2.components[0].h_samp_factor == 1
    assert np.array_equal(im2.components[1].coefs, cb)


def test_bad_jpeg_raises():
    with pytest.raises(ValueError):
        jpegio.read_coefficients(b"\xff\xd8not a jpeg at all")


def test_progressive_read():
    data = make_jpeg(48, 48, "photo", seed=6, color=True, progressive=True)
    im = jpegio.read_coefficients(data)
    assert im.progressive
    assert im.num_components == 3
