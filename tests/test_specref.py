"""Differential tests: NumPy spec vs the scalar reference binary.

The scalar (SIMD=none) build of /root/reference is the bit-exactness
ground truth (SURVEY.md §6).  Every case asserts identical output DCT
coefficient planes.
"""

import numpy as np
import pytest

from jpegqs_tpu import specref
from jpegqs_tpu.host import jpegio
from jpegqs_tpu.options import QsOptions
from util import make_jpeg, run_reference, coef_arrays


def assert_matches_reference(data: bytes, quality: int, niter: int):
    ref_coefs = coef_arrays(run_reference(data, quality=quality, niter=niter))
    img = jpegio.read_coefficients(data)
    res = specref.do_quantsmooth(img, QsOptions.from_quality(quality, niter))
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
                f"component {ci}: {len(bad)} coef mismatches, first at {t}: "
                f"got {got[t]} want {want[t]}")


@pytest.mark.parametrize("quality", range(7))
def test_gray_all_qualities(quality):
    assert_matches_reference(make_jpeg(64, 64, "photo", seed=1, quality=70),
                             quality, 3)


@pytest.mark.parametrize("quality", [3, 4, 5, 6])
def test_color_420_all_qualities(quality):
    assert_matches_reference(
        make_jpeg(64, 48, "photo", seed=3, color=True, quality=70, subsamp=1),
        quality, 3)


@pytest.mark.parametrize("subsamp", [0, 1, 2])
@pytest.mark.parametrize("quality", [5, 6])
def test_color_subsampling_modes(subsamp, quality):
    assert_matches_reference(
        make_jpeg(48, 56, "photo", seed=5, color=True, quality=80,
                  subsamp=subsamp), quality, 3)


@pytest.mark.parametrize("quality", [3, 5, 6])
def test_odd_sizes(quality):
    assert_matches_reference(
        make_jpeg(49, 42, "photo", seed=6, color=True, quality=65, subsamp=1),
        quality, 3)
    assert_matches_reference(make_jpeg(41, 53, "edges", seed=2, quality=55),
                             quality, 3)


@pytest.mark.parametrize("niter", [0, 1, 2, 5])
def test_niter_sweep(niter):
    assert_matches_reference(make_jpeg(64, 64, "photo", seed=1, quality=70),
                             3, niter)


@pytest.mark.parametrize("kind", ["noise", "flat", "edges"])
def test_content_kinds(kind):
    assert_matches_reference(make_jpeg(56, 40, kind, seed=7, quality=30), 3, 3)
    assert_matches_reference(
        make_jpeg(40, 40, kind, seed=8, color=True, quality=50), 6, 3)


@pytest.mark.parametrize("srcq", [10, 95])
def test_extreme_source_quality(srcq):
    assert_matches_reference(make_jpeg(64, 64, "photo", seed=11, quality=srcq),
                             3, 3)
    assert_matches_reference(
        make_jpeg(64, 48, "photo", seed=13, color=True, quality=srcq), 6, 3)


def test_progressive_input():
    data = make_jpeg(64, 56, "photo", seed=9, color=True, quality=70,
                     subsamp=1, progressive=True)
    assert_matches_reference(data, 3, 3)
    assert_matches_reference(data, 6, 3)


def test_idempotency():
    """Already-processed files (all quant == 1) skip iterations
    (quantsmooth.h:2500-2501)."""
    g = make_jpeg(64, 64, "photo", seed=1, quality=70)
    once = run_reference(g, 3, 3)
    assert_matches_reference(once, 3, 3)
    c = make_jpeg(64, 48, "photo", seed=3, color=True, quality=70)
    assert_matches_reference(run_reference(c, 3, 3), 6, 3)


def test_tiny_images():
    assert_matches_reference(make_jpeg(8, 16, "photo", seed=14, quality=60), 3, 3)
    assert_matches_reference(
        make_jpeg(16, 24, "photo", seed=15, color=True, quality=60), 6, 3)


def test_roundf_matches_c_semantics():
    """roundf = round half away from zero, incl. values 1 ulp from .5."""
    xs = np.array([0.5, -0.5, 1.5, -1.5, 2.5, 0.49999997, -0.49999997,
                   0.50000006, -0.50000006, 0.49999994, 100.5, -100.5,
                   0.0, -0.0, 1e6 + 0.5], dtype=np.float32)
    want = np.array([1, -1, 2, -2, 3, 0, 0, 1, -1, 0, 101, -101, 0, 0,
                     1000001], dtype=np.float32)
    got = specref.roundf(xs)
    assert np.array_equal(got, want)


def test_cumsum_is_strict_left_fold():
    rng = np.random.default_rng(0)
    for _ in range(50):
        x = (rng.standard_normal(242) * 10 ** rng.uniform(-6, 8, 242)
             ).astype(np.float32)
        acc = np.float32(0.0)
        for v in x:
            acc = np.float32(acc + v)
        assert np.cumsum(x, dtype=np.float32)[-1] == acc


def test_magic_table_division():
    """GET_ORIG_COEF reproduces round_half_away(c/q)*q for the whole
    operating range (quantsmooth.h:324-341, 2513-2539)."""
    for q in [1, 2, 3, 5, 7, 16, 17, 255, 511, 1024, 2047]:
        qv = specref.make_quantval192(np.full(64, q, np.uint16))
        c = np.arange(-0x2000, 0x2000, dtype=np.int32)
        a0 = specref.get_orig_coef(c, 0, qv)
        # reference semantics: (c + (c<0 ? -q/2 : q/2)) / q * q  (C trunc div)
        half = q >> 1
        num = c + np.where(c < 0, -half, half)
        want = (np.sign(num) * (np.abs(num) // q) * q).astype(np.int32)
        assert np.array_equal(a0, want), q
