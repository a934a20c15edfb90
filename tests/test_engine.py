"""Differential tests: JAX engine vs the scalar reference binary.

The engine must be bit-exact with the scalar (SIMD=none) reference
build at every quality level (SURVEY.md §6) — the same contract
test_specref.py enforces for the NumPy spec.  Unit tests at the bottom
pin the tricky device-side constructions (int64-free rebalance, the C
float->int cast, the strict left fold) against the NumPy spec.
"""

import numpy as np
import pytest

from jpegqs_tpu import engine, specref
from jpegqs_tpu.host import jpegio
from jpegqs_tpu.options import QsOptions
from util import make_jpeg, run_reference, coef_arrays


def assert_matches_reference(data: bytes, quality: int, niter: int):
    ref_coefs = coef_arrays(run_reference(data, quality=quality, niter=niter))
    img = jpegio.read_coefficients(data)
    res = engine.smooth(img, QsOptions.from_quality(quality, niter))
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


@pytest.mark.parametrize("quality", range(7))
def test_color_420_all_qualities(quality):
    assert_matches_reference(
        make_jpeg(64, 48, "photo", seed=3, color=True, quality=70, subsamp=1),
        quality, 3)


@pytest.mark.parametrize("subsamp", [0, 2])
@pytest.mark.parametrize("quality", [5, 6])
def test_color_subsampling_modes(subsamp, quality):
    assert_matches_reference(
        make_jpeg(48, 56, "photo", seed=5, color=True, quality=80,
                  subsamp=subsamp), quality, 3)


@pytest.mark.parametrize("quality", [3, 6])
def test_odd_sizes(quality):
    assert_matches_reference(
        make_jpeg(49, 42, "photo", seed=6, color=True, quality=65, subsamp=1),
        quality, 3)


@pytest.mark.parametrize("niter", [0, 1, 5])
def test_niter_sweep(niter):
    assert_matches_reference(make_jpeg(64, 64, "photo", seed=1, quality=70),
                             3, niter)


@pytest.mark.parametrize("kind", ["noise", "flat", "edges"])
def test_content_kinds(kind):
    assert_matches_reference(make_jpeg(64, 64, kind, seed=7, quality=30), 3, 3)


@pytest.mark.parametrize("srcq", [10, 95])
def test_extreme_source_quality(srcq):
    assert_matches_reference(make_jpeg(64, 64, "photo", seed=11, quality=srcq),
                             3, 3)
    assert_matches_reference(
        make_jpeg(64, 48, "photo", seed=13, color=True, quality=srcq,
                  subsamp=1), 6, 3)


def test_progressive_input():
    data = make_jpeg(64, 48, "photo", seed=9, color=True, quality=70,
                     subsamp=1, progressive=True)
    assert_matches_reference(data, 3, 3)


def test_idempotency():
    """Already-processed files (all quant == 1) skip iterations."""
    g = make_jpeg(64, 64, "photo", seed=1, quality=70)
    assert_matches_reference(run_reference(g, 3, 3), 3, 3)


def test_transcode_bytes_roundtrip():
    """smooth_jpeg_bytes output re-reads with all quant tables == 1."""
    data = make_jpeg(64, 48, "photo", seed=3, color=True, quality=70,
                     subsamp=1)
    out = engine.smooth_jpeg_bytes(data, QsOptions.from_quality(3, 3))
    img = jpegio.read_coefficients(out)
    for c in img.components:
        assert np.all(c.quantval == 1)


# ---------------------------------------------------------------------------
# Unit tests: device-side constructions vs the NumPy spec
# ---------------------------------------------------------------------------

def test_rebalance_pair_math_vs_spec():
    """int32-pair rebalance == spec's int64 rebalance on random blocks."""
    import jax.numpy as jnp
    from jpegqs_tpu.ops.rebalance import rebalance_blocks
    from jpegqs_tpu.ops.quant import make_quant_tables

    rng = np.random.default_rng(42)
    for trial in range(5):
        qtbl = rng.integers(1, 255, 64).astype(np.uint16)
        qv = specref.make_quantval192(qtbl)
        div, x1, qshr = make_quant_tables(qtbl)
        # coefficients near lattice points (the reachable state space)
        q = qtbl.astype(np.int32)
        lattice = rng.integers(-8, 9, (256, 64)).astype(np.int32) * q[None, :]
        jitter = rng.integers(-1, 2, (256, 64)).astype(np.int32) * (
            q[None, :] // 2)
        coef = np.clip(lattice + jitter, -32768, 32767).astype(np.int32)
        want = specref.rebalance_blocks(coef, qv)
        got = np.asarray(rebalance_blocks(
            jnp.asarray(coef), jnp.asarray(div), jnp.asarray(x1),
            jnp.asarray(qshr)))
        assert np.array_equal(got, want), f"trial {trial}"


def test_solver_vs_spec_random_blocks():
    import jax.numpy as jnp
    from jpegqs_tpu.ops.solver import solve_blocks
    from jpegqs_tpu.ops.quant import make_quant_tables

    rng = np.random.default_rng(7)
    for flags in (0, 1):
        qtbl = rng.integers(1, 120, 64).astype(np.uint16)
        qv = specref.make_quantval192(qtbl)
        div, x1, qshr = make_quant_tables(qtbl)
        tables = specref.make_solver_tables(flags)
        coef = (rng.integers(-40, 41, (64, 64)).astype(np.int32)
                * qtbl[None, :].astype(np.int32))
        borders = rng.integers(0, 256, (64, 4, 8)).astype(np.int32)
        want = specref.solve_blocks(coef, borders, qv, flags, tables)
        got = np.asarray(solve_blocks(
            jnp.asarray(coef), jnp.asarray(borders), jnp.asarray(div),
            jnp.asarray(x1), jnp.asarray(qshr), tables))
        assert np.array_equal(got, want), f"flags {flags}"


def test_c_f32_to_i32_semantics():
    """cvttss2si: trunc toward zero; NaN/out-of-range -> INT32_MIN."""
    import jax.numpy as jnp
    from jpegqs_tpu.ops.quant import c_f32_to_i32

    xs = np.array([0.0, -0.0, 1.9, -1.9, 2147483520.0, -2147483648.0,
                   2147483648.0, -2147483904.0, np.inf, -np.inf, np.nan,
                   1e38], dtype=np.float32)
    want = np.array([0, 0, 1, -1, 2147483520, -2147483648,
                     -2147483648, -2147483648, -2147483648, -2147483648,
                     -2147483648, -2147483648], dtype=np.int32)
    got = np.asarray(c_f32_to_i32(jnp.asarray(xs)))
    assert np.array_equal(got, want)


def test_idct_islow_vs_spec():
    import jax.numpy as jnp
    from jpegqs_tpu.ops.dct import idct_islow

    rng = np.random.default_rng(3)
    coef = rng.integers(-2048, 2048, (128, 8, 8)).astype(np.int32)
    want = specref.idct_islow(coef)
    got = np.asarray(idct_islow(jnp.asarray(coef)))
    assert np.array_equal(got, want)


def test_fdct_float_vs_spec():
    import jax.numpy as jnp
    from jpegqs_tpu.ops.dct import fdct_float

    rng = np.random.default_rng(4)
    fb = (rng.uniform(-128, 128, (128, 8, 8))).astype(np.float32)
    want = specref.fdct_float(fb)
    got = np.asarray(fdct_float(jnp.asarray(fb)))
    assert np.array_equal(got, want)


def test_downsample_blocks_matches_plane():
    """Block-wise downsample == plane downsample (interior + halos)."""
    import jax.numpy as jnp
    from jpegqs_tpu.ops import planar
    from jpegqs_tpu.ops.plane import downsample_plane

    rng = np.random.default_rng(6)
    for hb_l, wb_l, ws, hs in ((6, 8, 2, 2), (7, 9, 2, 2), (5, 7, 2, 1),
                               (6, 5, 1, 2), (4, 4, 1, 1)):
        hb_c = -(-hb_l // hs)
        wb_c = -(-wb_l // ws)
        pix = rng.integers(0, 256, (8, 8, hb_l * wb_l)).astype(np.int32)
        plane = np.asarray(planar.pix_to_plane(jnp.asarray(pix), hb_l, wb_l))
        want_padded = np.asarray(downsample_plane(
            jnp.asarray(plane), hb_l, wb_l, hb_c, wb_c, ws, hs))
        want_halo = np.asarray(planar.padded_plane_to_halo10(
            jnp.asarray(want_padded), hb_c, wb_c))
        ds = planar.downsample_blocks(jnp.asarray(pix), hb_l, wb_l,
                                      hb_c, wb_c, ws, hs)
        got_halo = np.asarray(planar.blocks_halo10(ds, hb_c, wb_c))
        assert np.array_equal(got_halo, want_halo), (hb_l, wb_l, ws, hs)


@pytest.mark.parametrize("quality", [5, 6])
def test_color_440_sampling(quality):
    """4:4:0 (1x2 sampling) exercises the vertical-only downsample."""
    assert_matches_reference(
        make_jpeg(56, 48, "photo", seed=17, color=True, quality=75,
                  subsamp=3), quality, 3)


@pytest.mark.parametrize("quality", [0, 3, 6])
def test_color_411_sampling(quality):
    """4:1:1 (4x1 luma sampling) exercises the exotic-factor plane path
    (reference supports any libjpeg factors, quantsmooth.h:2753-2815)."""
    assert_matches_reference(
        make_jpeg(48, 72, "photo", seed=23, color=True, quality=75,
                  subsamp=4), quality, 2)


@pytest.mark.parametrize("quality", [3, 5])
def test_color_4x2_sampling(quality):
    """Luma 4x2 sampling: both axes downsampled, ws=4 exotic path."""
    assert_matches_reference(
        make_jpeg(48, 64, "photo", seed=24, color=True, quality=75,
                  subsamp=5), quality, 2)


@pytest.mark.parametrize("quality", [1, 3])
def test_cmyk_four_components(quality):
    """CMYK input: 4 non-YCbCr components, every one treated as luma
    (reference gates color features on JCS_YCbCr, quantsmooth.h:2447)."""
    assert_matches_reference(
        make_jpeg(48, 48, "photo", seed=25, color="cmyk", quality=80),
        quality, 2)


def test_niter_clamp_at_100():
    """niter > 100 clamps to JPEGQS_ITER_MAX (libjpegqs.h:15,
    quantsmooth.h:2455-2456) — LOW_QUALITY path keeps compile small."""
    data = make_jpeg(24, 24, "photo", seed=26, quality=70)
    assert_matches_reference(data, 0, 101)
    img = jpegio.read_coefficients(data)
    a = engine.smooth(img, QsOptions.from_quality(0, 101))
    b = engine.smooth(img, QsOptions.from_quality(0, 100))
    assert np.array_equal(a.coefs[0], b.coefs[0])


@pytest.mark.parametrize("quality", [3, 6])
def test_arithmetic_coded_input(quality):
    """Arithmetic-coded JPEGs: the coefficient planes reach the engine
    through the same libjpeg paths the reference uses
    (quantsmooth.c:548-549, 579); the output stays arithmetic-coded via
    jpeg_copy_critical_parameters, on both sides."""
    assert_matches_reference(
        make_jpeg(56, 64, "photo", seed=31, color=True, quality=70,
                  subsamp=1, arith=True), quality, 3)


def test_restart_interval_input():
    """DRI/RSTn-marked streams decode to the same coefficient planes;
    the interval survives into the output (libjpeg critical params)."""
    data = make_jpeg(64, 56, "photo", seed=32, quality=70,
                     restart_interval=3)
    assert b"\xff\xdd" in data  # DRI present in the fixture
    assert_matches_reference(data, 3, 3)


@pytest.mark.parametrize("flags", [16 | 1, 32 | 2 | 1, 48 | 2 | 1])
def test_no_rebalance_flag_combos(flags):
    """NO_REBALANCE / NO_REBALANCE_UV per-component gating
    (quantsmooth.h:1569-1573: UV bit only affects chroma)."""
    data = make_jpeg(48, 56, "photo", seed=27, color=True, quality=70,
                     subsamp=1)
    ref_coefs = coef_arrays(run_reference(
        data, extra_args=("-f", str(flags), "-n", "2"), quality=3,
        niter=2))
    img = jpegio.read_coefficients(data)
    res = engine.smooth(img, QsOptions(flags=flags, niter=2))
    for ci in range(len(img.components)):
        assert np.array_equal(res.coefs[ci], ref_coefs[ci][0]), f"c{ci}"


def test_lq_444_noise_fence_regression():
    """Round-5 fuzz find: q0 (LOW_QUALITY) on 4:4:4 noise content hit a
    near-tie in the shrink accumulators that exposed XOR-fence
    cancellation on XLA:CPU (stacked fences from fadd(zeros, fmul(..))
    cancelled, letting LLVM FMA-contract the first fold term — 1-ulp
    accumulator errors flipping a trunc).  The integer-ADD fence fixes
    it (ops/fp32.py); this pins the exact failing input.  TPU/Mosaic
    never contracted (verified on hardware)."""
    data = make_jpeg(201, 190, "noise", seed=201 * 997 + 190, color=True,
                     quality=75, subsamp=0, progressive=True)
    assert_matches_reference(data, 0, 5)


@pytest.mark.parametrize("subsamp", [0, 1])
def test_upsample_niter0(subsamp):
    """q2 (UPSAMPLE_UV flags) with niter=0 — the reference still enters
    the component loop for the sake of UPSAMPLE (quantsmooth.h:2458),
    but at 4:4:4 image1 is never created (image2 = image directly,
    quantsmooth.h:2753-2761) and the chroma components fall out of the
    loop entirely (num_iter2 + extra_refresh == 0 -> continue, h:2542).
    Round-5 fuzz find: the fused program indexed the dropped chroma
    config and crashed."""
    data = make_jpeg(63, 146, "flat", seed=63 * 997 + 146, color=True,
                     quality=63, subsamp=subsamp)
    ref_coefs = coef_arrays(run_reference(data, quality=2, niter=0))
    img = jpegio.read_coefficients(data)
    res = engine.smooth(img, QsOptions.from_quality(2, 0))
    if res.upsampled is not None:
        ours = [res.coefs[0], res.upsampled[0], res.upsampled[1]]
    else:
        ours = res.coefs
    for ci in range(len(img.components)):
        assert np.array_equal(ours[ci], ref_coefs[ci][0]), f"c{ci}"
