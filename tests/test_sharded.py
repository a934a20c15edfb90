"""Sharded engine == single-device engine, bit for bit.

Runs on the 8-virtual-device CPU mesh from conftest (SURVEY.md §4.3).
The halo-exchange logic is validated by comparing sharded output
against the single-device engine on the same inputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from jpegqs_tpu.engine import component_smooth
from jpegqs_tpu.ops.quant import make_quant_tables
from jpegqs_tpu.parallel.sharded import make_sharded_smooth, row_sharding

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _component(hb, wb, seed=0, qscale=1.0):
    rng = np.random.default_rng(seed)
    qtbl = np.clip((rng.integers(4, 80, 64) * qscale).astype(np.int32), 1, 255)
    # keep |coef*q| < 0x800 so the crafted-file guard stays quiet
    cap = 2047 // qtbl
    coef16 = (rng.integers(-50, 51, (hb * wb, 64))
              // (1 + np.arange(64) // 8)).astype(np.int64)
    coef16 = np.clip(coef16, -cap[None, :], cap[None, :]).astype(np.int16)
    return coef16, qtbl


@pytest.mark.parametrize("flags,niter", [(0, 3), (1, 2), (8 | 1, 1)])
def test_sharded_matches_single_device(flags, niter):
    hb, wb = 16, 12
    coef16, qtbl = _component(hb, wb, seed=5)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)

    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=flags, niter=niter, extra_refresh=0,
        luma=True, use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=flags, niter=niter,
                             luma=True)
    coef_dev = jax.device_put(coef16.reshape(hb, wb, 64),
                              row_sharding(mesh))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr))
    got = np.asarray(got)
    assert not bool(badv)
    assert np.array_equal(got, want)


def test_sharded_batch_dp():
    """2-D mesh: batch DP x row sharding, every image bit-exact."""
    hb, wb, n_batch = 8, 8, 4
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "row"))
    coefs = []
    qtbl = _component(hb, wb, seed=9)[1]
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    for i in range(n_batch):
        coefs.append(_component(hb, wb, seed=100 + i)[0])
    batch = np.stack([c.reshape(hb, wb, 64) for c in coefs])

    wants = []
    for c in coefs:
        w, _, _ = component_smooth(
            jnp.asarray(c), jnp.asarray(qraw), jnp.asarray(div),
            jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
            hb=hb, wb=wb, flags=1, niter=2, extra_refresh=0, luma=True,
            use_image2=False)
        wants.append(np.asarray(w).reshape(hb, wb, 64))

    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=1, niter=2,
                             luma=True, batch_axis="data")
    coef_dev = jax.device_put(
        batch, row_sharding(mesh, batch_axis="data", batched=True))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr))
    got = np.asarray(got)
    for i in range(n_batch):
        assert np.array_equal(got[i], wants[i]), f"image {i}"


def test_sharded_joint_yuv_matches_single_device():
    """JOINT_YUV chroma pass with a row-sharded image2 (+halo)."""
    hb, wb = 16, 8
    rng = np.random.default_rng(21)
    coef16, qtbl = _component(hb, wb, seed=21)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    # a synthetic downsampled-luma padded plane (interior + 1px pad)
    interior = rng.integers(0, 256, (hb * 8, wb * 8)).astype(np.int32)
    image2_padded = np.pad(interior, 1, mode="edge")
    flags = 2 | 1  # JOINT_YUV | DIAGONALS

    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.asarray(image2_padded),
        hb=hb, wb=wb, flags=flags, niter=2, extra_refresh=0,
        luma=False, use_image2=True)
    want = np.asarray(want).reshape(hb, wb, 64)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=flags, niter=2,
                             luma=False, use_image2=True)
    coef_dev = jax.device_put(coef16.reshape(hb, wb, 64),
                              row_sharding(mesh))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr),
                   jnp.asarray(interior))
    assert np.array_equal(np.asarray(got), want)


def test_sharded_large_plane():
    """A taller plane (pano analogue scaled for CPU test time):
    many block rows per shard, multiple halo exchanges."""
    hb, wb = 64, 24   # 512x192 px
    coef16, qtbl = _component(hb, wb, seed=33)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=1, niter=2, extra_refresh=0, luma=True,
        use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=1, niter=2,
                             luma=True)
    coef_dev = jax.device_put(coef16.reshape(hb, wb, 64),
                              row_sharding(mesh))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr))
    assert np.array_equal(np.asarray(got), want)


def test_sharded_ycbcr_end_to_end():
    """Full sharded YCbCr q5 flow (luma -> sharded downsample ->
    chroma JOINT with halo'd image2) == single-device engine."""
    from jpegqs_tpu.parallel.sharded import make_sharded_ycbcr_smooth
    from jpegqs_tpu.host.jpegio import JpegImage, ComponentData
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions

    hb_l, wb_l, hb_c, wb_c, ws, hs = 16, 8, 8, 4, 2, 2
    rng = np.random.default_rng(55)
    qt_y = np.clip(rng.integers(2, 60, 64), 1, 255).astype(np.uint16)
    qt_c = np.clip(rng.integers(2, 40, 64), 1, 255).astype(np.uint16)

    def mkcoef(hb, wb, qt, seed):
        r = np.random.default_rng(seed)
        cap = 2047 // qt.astype(np.int32)
        c = r.integers(-40, 41, (hb, wb, 64)) // (1 + np.arange(64) // 8)
        return np.clip(c, -cap, cap).astype(np.int16)

    cy = mkcoef(hb_l, wb_l, qt_y, 1)
    ccb = mkcoef(hb_c, wb_c, qt_c, 2)
    ccr = mkcoef(hb_c, wb_c, qt_c, 3)

    # single-device reference result via the engine
    img = JpegImage(width=wb_l * 8, height=hb_l * 8, jpeg_color_space=3,
                    progressive=False, max_h_samp_factor=ws,
                    max_v_samp_factor=hs)
    for ci, (h, w, sf, qt, co) in enumerate((
            (hb_l, wb_l, (ws, hs), qt_y, cy),
            (hb_c, wb_c, (1, 1), qt_c, ccb),
            (hb_c, wb_c, (1, 1), qt_c, ccr))):
        img.components.append(ComponentData(
            component_id=ci, h_samp_factor=sf[0], v_samp_factor=sf[1],
            quant_tbl_no=0 if ci == 0 else 1, width_in_blocks=w,
            height_in_blocks=h, quantval=qt, coefs=co.copy()))
    opts = QsOptions(flags=2 | 1, niter=2)   # JOINT_YUV | DIAGONALS
    want = engine.smooth(img, opts)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_ycbcr_smooth(mesh, hb_l=hb_l, wb_l=wb_l, hb_c=hb_c,
                                   wb_c=wb_c, ws=ws, hs=hs, flags=2 | 1,
                                   niter=2)

    def tabs(qt):
        qraw = qt.astype(np.int32)
        div, x1, qshr = make_quant_tables(qraw)
        return tuple(map(jnp.asarray, (qraw, div, x1, qshr)))

    sh = row_sharding(mesh)
    y, cb, cr, bad, ups = fn(jax.device_put(cy, sh),
                             jax.device_put(ccb, sh),
                             jax.device_put(ccr, sh), tabs(qt_y),
                             tabs(qt_c))
    assert np.array_equal(np.asarray(y), want.coefs[0])
    assert np.array_equal(np.asarray(cb), want.coefs[1])
    assert np.array_equal(np.asarray(cr), want.coefs[2])
    assert ups is None


@pytest.mark.parametrize("dims", [
    # (hb_l, wb_l, img pads): even dims, and an odd-height image whose
    # replicate tails exercise the last-block-row masks
    (16, 8, 0, 0),
    (16, 8, 3, 5),
])
def test_sharded_ycbcr_q6_upsample(dims):
    """Sharded q6 (JOINT + UPSAMPLE_UV) == single-device engine,
    including the full-res chroma coefficient planes."""
    from jpegqs_tpu.parallel.sharded import make_sharded_ycbcr_smooth
    from jpegqs_tpu.host.jpegio import JpegImage, ComponentData
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions

    hb_l, wb_l, pad_h, pad_w = dims
    ws = hs = 2
    hb_c, wb_c = hb_l // hs, wb_l // ws
    img_w, img_h = wb_l * 8 - pad_w, hb_l * 8 - pad_h
    rng = np.random.default_rng(77)
    qt_y = np.clip(rng.integers(2, 60, 64), 1, 255).astype(np.uint16)
    qt_c = np.clip(rng.integers(2, 40, 64), 1, 255).astype(np.uint16)

    def mkcoef(hb, wb, qt, seed):
        r = np.random.default_rng(seed)
        cap = 2047 // qt.astype(np.int32)
        c = r.integers(-40, 41, (hb, wb, 64)) // (1 + np.arange(64) // 8)
        return np.clip(c, -cap, cap).astype(np.int16)

    cy = mkcoef(hb_l, wb_l, qt_y, 4)
    ccb = mkcoef(hb_c, wb_c, qt_c, 5)
    ccr = mkcoef(hb_c, wb_c, qt_c, 6)

    img = JpegImage(width=img_w, height=img_h, jpeg_color_space=3,
                    progressive=False, max_h_samp_factor=ws,
                    max_v_samp_factor=hs)
    for ci, (h, w, sf, qt, co) in enumerate((
            (hb_l, wb_l, (ws, hs), qt_y, cy),
            (hb_c, wb_c, (1, 1), qt_c, ccb),
            (hb_c, wb_c, (1, 1), qt_c, ccr))):
        img.components.append(ComponentData(
            component_id=ci, h_samp_factor=sf[0], v_samp_factor=sf[1],
            quant_tbl_no=0 if ci == 0 else 1, width_in_blocks=w,
            height_in_blocks=h, quantval=qt, coefs=co.copy()))
    flags = 4 | 2 | 1   # UPSAMPLE_UV | JOINT_YUV | DIAGONALS
    want = engine.smooth(img, QsOptions(flags=flags, niter=2))
    assert want.upsampled is not None

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_ycbcr_smooth(mesh, hb_l=hb_l, wb_l=wb_l, hb_c=hb_c,
                                   wb_c=wb_c, ws=ws, hs=hs, flags=flags,
                                   niter=2, img_w=img_w, img_h=img_h)

    def tabs(qt):
        qraw = qt.astype(np.int32)
        div, x1, qshr = make_quant_tables(qraw)
        return tuple(map(jnp.asarray, (qraw, div, x1, qshr)))

    sh = row_sharding(mesh)
    y, cb, cr, bad, ups = fn(jax.device_put(cy, sh),
                             jax.device_put(ccb, sh),
                             jax.device_put(ccr, sh), tabs(qt_y),
                             tabs(qt_c))
    assert not bool(bad)
    assert np.array_equal(np.asarray(y), want.coefs[0])
    assert np.array_equal(np.asarray(cb), want.coefs[1])
    assert np.array_equal(np.asarray(cr), want.coefs[2])
    assert np.array_equal(np.asarray(ups[0]), want.upsampled[0])
    assert np.array_equal(np.asarray(ups[1]), want.upsampled[1])


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__
    import jax as _jax
    fn, args = __graft_entry__.entry()
    out = _jax.jit(fn)(*args)
    assert out.shape == (256, 64)


@pytest.mark.parametrize("color,quality", [(False, 3), (True, 5),
                                           (True, 6), (False, 0)])
def test_engine_auto_sharding(monkeypatch, color, quality):
    """engine.smooth auto-routes big images through the sharded path
    (forced here via JPEGQS_SHARD_MIN_BLOCKS=0) bit-identically."""
    from util import make_jpeg
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions

    data = make_jpeg(128, 96, "photo", seed=13, color=color, quality=70)
    img = jpegio.read_coefficients(data)
    opts = QsOptions.from_quality(quality, 2)

    want = engine._smooth_fused(img, opts)
    monkeypatch.setenv("JPEGQS_SHARD_MIN_BLOCKS", "0")
    got = engine._try_smooth_sharded(img, opts)
    assert got is not None, "sharded path should apply"
    for ci in range(len(img.components)):
        assert np.array_equal(got.coefs[ci], want.coefs[ci]), f"comp {ci}"
    assert (got.upsampled is None) == (want.upsampled is None)
    if got.upsampled is not None:
        assert np.array_equal(got.upsampled[0], want.upsampled[0])
        assert np.array_equal(got.upsampled[1], want.upsampled[1])
    assert got.stop == want.stop


@pytest.mark.parametrize("h,w,color,quality,want_grid", [
    (16, 256, False, 3, (2, 4)),  # 2 block rows strand 6 devices -> 2x4
    (16, 512, True, 3, (1, 8)),   # 4:2:0 chroma has ONE block row -> 1x8
    (16, 512, True, 6, (1, 8)),   # col-sharded YCbCr JOINT+UPSAMPLE flow
])
def test_engine_auto_sharding_2d_grid(monkeypatch, h, w, color, quality,
                                      want_grid):
    """When row divisibility alone can't use every device, the engine
    auto-selects a 2-D (row x col) spatial grid — bit-identical to the
    single-device program (both ppermute halo directions + corners)."""
    from util import make_jpeg
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions

    data = make_jpeg(h, w, "photo", seed=19, color=color, quality=70)
    img = jpegio.read_coefficients(data)
    opts = QsOptions.from_quality(quality, 2)
    monkeypatch.setenv("JPEGQS_SHARD_MIN_BLOCKS", "0")
    assert engine._shard_grid(img, opts) == want_grid
    want = engine._smooth_fused(img, opts)
    got = engine._try_smooth_sharded(img, opts)
    assert got is not None, "sharded path should apply"
    for ci in range(len(img.components)):
        assert np.array_equal(got.coefs[ci], want.coefs[ci]), f"comp {ci}"
    assert (got.upsampled is None) == (want.upsampled is None)
    if got.upsampled is not None:
        assert np.array_equal(got.upsampled[0], want.upsampled[0])
        assert np.array_equal(got.upsampled[1], want.upsampled[1])
    assert got.stop == want.stop


@pytest.mark.parametrize("quality,expect_grid", [(5, (1, 2)), (6, None)])
def test_engine_narrow_joint_col_grid(monkeypatch, quality, expect_grid):
    """A 4:4:0 strip with ONE local luma block column: JOINT-only (q5)
    may col-shard (the >=2-column guard is an UPSAMPLE right-tail
    constraint), while q6 must fall back — and single-device output is
    reproduced either way."""
    from util import make_jpeg
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions

    data = make_jpeg(16, 16, "photo", seed=29, color=True, quality=70,
                     subsamp=3)   # 4:4:0 -> wb_l == wb_c == 2
    img = jpegio.read_coefficients(data)
    opts = QsOptions.from_quality(quality, 2)
    monkeypatch.setenv("JPEGQS_SHARD_MIN_BLOCKS", "0")
    want = engine._smooth_fused(img, opts)
    got = engine._try_smooth_sharded(img, opts)
    if expect_grid is None:
        assert got is None   # falls back to the single-device program
        return
    assert engine._shard_grid(img, opts) == expect_grid
    for ci in range(len(img.components)):
        assert np.array_equal(got.coefs[ci], want.coefs[ci]), f"comp {ci}"


# ---------------------------------------------------------------------------
# Resident-tile sharded path (JPEGQS_PALLAS=1 -> interpret-mode kernels
# with ghost-row boundary exchange; see sharded._sharded_resident_iters)
# ---------------------------------------------------------------------------

def test_sharded_resident_matches_single_device(monkeypatch):
    """Ghost-row resident loop == single-device engine, bit for bit
    (plain solver path; non-DIAG flags keep interpret compiles small)."""
    monkeypatch.setenv("JPEGQS_PALLAS", "1")
    hb, wb = 16, 12
    coef16, qtbl = _component(hb, wb, seed=5)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=0, niter=2, extra_refresh=0,
        luma=True, use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=0, niter=2,
                             luma=True)
    coef_dev = jax.device_put(coef16.reshape(hb, wb, 64),
                              row_sharding(mesh))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr))
    assert not bool(badv)
    assert np.array_equal(np.asarray(got), want)


def test_sharded_resident_joint(monkeypatch):
    """Ghost-row resident loop, JOINT_YUV chroma with sharded image2."""
    monkeypatch.setenv("JPEGQS_PALLAS", "1")
    hb, wb = 16, 8
    rng = np.random.default_rng(23)
    coef16, qtbl = _component(hb, wb, seed=23)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    interior = rng.integers(0, 256, (hb * 8, wb * 8)).astype(np.int32)
    image2_padded = np.pad(interior, 1, mode="edge")
    flags = 2  # JOINT_YUV, no DIAGONALS (small interpret programs)
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.asarray(image2_padded),
        hb=hb, wb=wb, flags=flags, niter=2, extra_refresh=0,
        luma=False, use_image2=True)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=flags, niter=2,
                             luma=False, use_image2=True)
    coef_dev = jax.device_put(coef16.reshape(hb, wb, 64),
                              row_sharding(mesh))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr),
                   jnp.asarray(interior))
    assert np.array_equal(np.asarray(got), want)


def test_sharded_resident_2d_grid(monkeypatch):
    """Ghost-row AND ghost-column resident loop on a 2-D (row x col)
    spatial mesh: one row + one column boundary exchange per
    iteration, everything else kernel-resident; output bit-identical
    to the single-device engine."""
    monkeypatch.setenv("JPEGQS_PALLAS", "1")
    hb, wb = 8, 12
    coef16, qtbl = _component(hb, wb, seed=71)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=0, niter=2, extra_refresh=0,
        luma=True, use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("row", "col"))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=0, niter=2,
                             luma=True, col_axis="col")
    coef_dev = jax.device_put(coef16.reshape(hb, wb, 64),
                              row_sharding(mesh, col_axis="col"))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr))
    assert not bool(badv)
    assert np.array_equal(np.asarray(got), want)


def test_sharded_resident_2d_joint(monkeypatch):
    """2-D-grid resident loop, JOINT_YUV chroma: the grid-embedded
    image2 halo rides the ghost-extended tile layout."""
    monkeypatch.setenv("JPEGQS_PALLAS", "1")
    hb, wb = 8, 8
    rng = np.random.default_rng(75)
    coef16, qtbl = _component(hb, wb, seed=75)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    interior = rng.integers(0, 256, (hb * 8, wb * 8)).astype(np.int32)
    image2_padded = np.pad(interior, 1, mode="edge")
    flags = 2  # JOINT_YUV, no DIAGONALS (small interpret programs)
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.asarray(image2_padded),
        hb=hb, wb=wb, flags=flags, niter=2, extra_refresh=0,
        luma=False, use_image2=True)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("row", "col"))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=flags, niter=2,
                             luma=False, use_image2=True, col_axis="col")
    got, badv = fn(coef16.reshape(hb, wb, 64), jnp.asarray(qraw),
                   jnp.asarray(div), jnp.asarray(x1), jnp.asarray(qshr),
                   jnp.asarray(interior))
    assert np.array_equal(np.asarray(got), want)


def test_sharded_resident_2d_pad_diag(monkeypatch):
    """2-D-grid resident loop with DIAGONALS (in-VMEM corner rebuild
    through the ghost columns) and pad-to-divisible real edges
    mid-shard on BOTH axes (hb=9 on 4 row-shards, wb=6 on 2)."""
    monkeypatch.setenv("JPEGQS_PALLAS", "1")
    hb, wb = 9, 6
    coef16, qtbl = _component(hb, wb, seed=74)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=1, niter=1, extra_refresh=0,
        luma=True, use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("row", "col"))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=1, niter=1,
                             luma=True, col_axis="col")
    got, badv = fn(coef16.reshape(hb, wb, 64), jnp.asarray(qraw),
                   jnp.asarray(div), jnp.asarray(x1), jnp.asarray(qshr))
    assert not bool(badv)
    assert np.array_equal(np.asarray(got), want)


def test_sharded_resident_overlap_split(monkeypatch):
    """JPEGQS_OVERLAP=1: each resident pass splits into interior tiles
    (reading the PRE-exchange pixels — no data dependency on the
    ppermute, so XLA can fly the collective under them) and boundary
    tiles that wait for it.  Needs a plane big enough that interior
    tiles exist (hb_loc=7, wb=512 -> tiles 2..3 of 5 are interior);
    2 shards keep the interpret-mode run time bounded; output must
    match the single-device engine bit for bit."""
    monkeypatch.setenv("JPEGQS_PALLAS", "1")
    monkeypatch.setenv("JPEGQS_OVERLAP", "1")
    hb, wb = 14, 512
    coef16, qtbl = _component(hb, wb, seed=81)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    monkeypatch.setenv("JPEGQS_PALLAS", "0")  # fast XLA oracle
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=0, niter=1, extra_refresh=1,
        luma=True, use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)
    monkeypatch.setenv("JPEGQS_PALLAS", "1")
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("row",))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=0, niter=1,
                             extra_refresh=1, luma=True)
    coef_dev = jax.device_put(coef16.reshape(hb, wb, 64),
                              row_sharding(mesh))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr))
    assert not bool(badv)
    assert np.array_equal(np.asarray(got), want)


@pytest.mark.parametrize("flags,niter", [(1, 2), (8 | 1, 1)])
def test_sharded_2d_mesh_matches_single_device(flags, niter):
    """2-D SPATIAL mesh (block rows x block columns): both halo
    directions and the diagonal corners ride ppermute; output is
    bit-identical to the single-device engine."""
    hb, wb = 8, 12
    coef16, qtbl = _component(hb, wb, seed=71)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)

    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=flags, niter=niter, extra_refresh=0,
        luma=True, use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("row", "col"))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=flags, niter=niter,
                             luma=True, col_axis="col")
    coef_dev = jax.device_put(coef16.reshape(hb, wb, 64),
                              row_sharding(mesh, col_axis="col"))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr))
    assert not bool(badv)
    assert np.array_equal(np.asarray(got), want)


def test_sharded_2d_mesh_joint_yuv():
    """JOINT_YUV chroma pass on a 2-D spatial mesh with a 2-D-sharded
    image2 plane (halo exchange on both axes)."""
    hb, wb = 8, 8
    rng = np.random.default_rng(72)
    coef16, qtbl = _component(hb, wb, seed=72)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    interior = rng.integers(0, 256, (hb * 8, wb * 8)).astype(np.int32)
    image2_padded = np.pad(interior, 1, mode="edge")
    flags = 2 | 1  # JOINT_YUV | DIAGONALS

    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.asarray(image2_padded),
        hb=hb, wb=wb, flags=flags, niter=2, extra_refresh=0,
        luma=False, use_image2=True)
    want = np.asarray(want).reshape(hb, wb, 64)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("row", "col"))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=flags, niter=2,
                             luma=False, use_image2=True, col_axis="col")
    coef_dev = jax.device_put(coef16.reshape(hb, wb, 64),
                              row_sharding(mesh, col_axis="col"))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr),
                   jnp.asarray(interior))
    assert np.array_equal(np.asarray(got), want)


def test_sharded_3d_mesh_batch_row_col():
    """batch DP x 2-D spatial sharding on one 3-axis mesh."""
    hb, wb, n_batch = 8, 8, 2
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "row", "col"))
    qtbl = _component(hb, wb, seed=73)[1]
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    coefs = [_component(hb, wb, seed=200 + i)[0] for i in range(n_batch)]
    batch = np.stack([c.reshape(hb, wb, 64) for c in coefs])

    wants = []
    for c in coefs:
        w, _, _ = component_smooth(
            jnp.asarray(c), jnp.asarray(qraw), jnp.asarray(div),
            jnp.asarray(x1), jnp.asarray(qshr),
            jnp.zeros((1, 1), jnp.int32), hb=hb, wb=wb, flags=1, niter=2,
            extra_refresh=0, luma=True, use_image2=False)
        wants.append(np.asarray(w).reshape(hb, wb, 64))

    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=1, niter=2,
                             luma=True, batch_axis="data", col_axis="col")
    coef_dev = jax.device_put(
        batch, row_sharding(mesh, batch_axis="data", batched=True,
                            col_axis="col"))
    got, badv = fn(coef_dev, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr))
    got = np.asarray(got)
    for i in range(n_batch):
        assert np.array_equal(got[i], wants[i]), f"image {i}"


def test_engine_auto_sharding_crafted_file(monkeypatch):
    """badv through the auto-sharded per-component path matches the
    fused engine: the tripping plane is int16-wrapped dequant clamped
    to +/-1023, later planes plain (unclamped) dequant
    (quantsmooth.h:2596-2610 + 2668-2689 vs 2551-2566)."""
    from jpegqs_tpu.host.jpegio import JpegImage, ComponentData
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions

    rng = np.random.default_rng(31)
    qtbl = np.full(64, 64, np.uint16)
    coefs = rng.integers(-5, 6, (2, 8, 8, 64)).astype(np.int16)
    coefs[0, 0, 0, 3] = 1000  # comp 0 trips the |coef*q| guard
    img = JpegImage(width=64, height=64, jpeg_color_space=2,  # not YCbCr
                    progressive=False, max_h_samp_factor=1,
                    max_v_samp_factor=1)
    for ci in range(2):
        img.components.append(ComponentData(
            component_id=ci, h_samp_factor=1, v_samp_factor=1,
            quant_tbl_no=0, width_in_blocks=8, height_in_blocks=8,
            quantval=qtbl, coefs=coefs[ci].copy()))

    opts = QsOptions.from_quality(3, 2)
    want = engine._smooth_fused(img, opts)
    monkeypatch.setenv("JPEGQS_SHARD_MIN_BLOCKS", "0")
    got = engine._try_smooth_sharded(img, opts)
    assert got is not None, "sharded path should apply"
    assert got.stop == want.stop == 1
    for ci in range(2):
        assert np.array_equal(got.coefs[ci], want.coefs[ci]), f"comp {ci}"


# ---------------------------------------------------------------------------
# Pad-to-divisible sharding: planes whose block rows/cols do NOT divide
# the mesh axes are padded with dead blocks and masked at the real
# image edge (the OpenMP schedule(dynamic) analogue,
# quantsmooth.h:2586-2588).  Everything below compares against the
# single-device engine bit for bit.
# ---------------------------------------------------------------------------

def test_sharded_pad_prime_rows():
    """hb=13 (prime) on 8 row shards: the real bottom edge sits
    mid-shard; rank 7 is mostly dead rows."""
    hb, wb = 13, 16
    coef16, qtbl = _component(hb, wb, seed=41)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=1, niter=2, extra_refresh=0,
        luma=True, use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=1, niter=2,
                             luma=True)
    assert fn.padded_dims == (16, 16)
    got, badv = fn(coef16.reshape(hb, wb, 64), jnp.asarray(qraw),
                   jnp.asarray(div), jnp.asarray(x1), jnp.asarray(qshr))
    assert not bool(badv)
    assert got.shape == (hb, wb, 64)
    assert np.array_equal(np.asarray(got), want)


def test_sharded_pad_2d_grid():
    """Non-divisible rows AND columns on a 2x4 grid: both real edges
    sit mid-shard; corners must stay exact."""
    hb, wb = 5, 9
    coef16, qtbl = _component(hb, wb, seed=43)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=1, niter=2, extra_refresh=0,
        luma=True, use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("row", "col"))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=1, niter=2,
                             luma=True, col_axis="col")
    assert fn.padded_dims == (6, 12)
    got, badv = fn(coef16.reshape(hb, wb, 64), jnp.asarray(qraw),
                   jnp.asarray(div), jnp.asarray(x1), jnp.asarray(qshr))
    assert not bool(badv)
    assert np.array_equal(np.asarray(got), want)


def test_sharded_pad_joint_image2():
    """JOINT_YUV with a padded image2 plane: the downsampled-luma halo
    must replicate at the REAL bottom edge, not read dead rows."""
    hb, wb = 11, 8
    rng = np.random.default_rng(45)
    coef16, qtbl = _component(hb, wb, seed=45)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    interior = rng.integers(0, 256, (hb * 8, wb * 8)).astype(np.int32)
    image2_padded = np.pad(interior, 1, mode="edge")
    flags = 2 | 1
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.asarray(image2_padded),
        hb=hb, wb=wb, flags=flags, niter=2, extra_refresh=0,
        luma=False, use_image2=True)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=flags, niter=2,
                             luma=False, use_image2=True)
    got, badv = fn(coef16.reshape(hb, wb, 64), jnp.asarray(qraw),
                   jnp.asarray(div), jnp.asarray(x1), jnp.asarray(qshr),
                   interior)
    assert np.array_equal(np.asarray(got), want)


def test_sharded_pad_ycbcr_q6():
    """Full q6 YCbCr flow with non-divisible chroma rows (9 on 8
    shards): aligned real dims, padded shards, UPSAMPLE output sliced
    back to luma dims."""
    from jpegqs_tpu.parallel.sharded import make_sharded_ycbcr_smooth
    from jpegqs_tpu.host.jpegio import JpegImage, ComponentData
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions

    hb_l, wb_l, ws, hs = 18, 12, 2, 2
    hb_c, wb_c = hb_l // hs, wb_l // ws
    img_w, img_h = wb_l * 8 - 3, hb_l * 8 - 5
    rng = np.random.default_rng(47)
    qt_y = np.clip(rng.integers(2, 60, 64), 1, 255).astype(np.uint16)
    qt_c = np.clip(rng.integers(2, 40, 64), 1, 255).astype(np.uint16)

    def mkcoef(hb, wb, qt, seed):
        r = np.random.default_rng(seed)
        cap = 2047 // qt.astype(np.int32)
        c = r.integers(-40, 41, (hb, wb, 64)) // (1 + np.arange(64) // 8)
        return np.clip(c, -cap, cap).astype(np.int16)

    cy = mkcoef(hb_l, wb_l, qt_y, 8)
    ccb = mkcoef(hb_c, wb_c, qt_c, 9)
    ccr = mkcoef(hb_c, wb_c, qt_c, 10)
    img = JpegImage(width=img_w, height=img_h, jpeg_color_space=3,
                    progressive=False, max_h_samp_factor=ws,
                    max_v_samp_factor=hs)
    for ci, (h, w, sf, qt, co) in enumerate((
            (hb_l, wb_l, (ws, hs), qt_y, cy),
            (hb_c, wb_c, (1, 1), qt_c, ccb),
            (hb_c, wb_c, (1, 1), qt_c, ccr))):
        img.components.append(ComponentData(
            component_id=ci, h_samp_factor=sf[0], v_samp_factor=sf[1],
            quant_tbl_no=0 if ci == 0 else 1, width_in_blocks=w,
            height_in_blocks=h, quantval=qt, coefs=co.copy()))
    flags = 4 | 2 | 1
    want = engine.smooth(img, QsOptions(flags=flags, niter=2))
    assert want.upsampled is not None

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_ycbcr_smooth(mesh, hb_l=hb_l, wb_l=wb_l, hb_c=hb_c,
                                   wb_c=wb_c, ws=ws, hs=hs, flags=flags,
                                   niter=2, img_w=img_w, img_h=img_h)
    assert fn.padded_dims == (32, 12, 16, 6)

    def tabs(qt):
        qraw = qt.astype(np.int32)
        div, x1, qshr = make_quant_tables(qraw)
        return tuple(map(jnp.asarray, (qraw, div, x1, qshr)))

    y, cb, cr, bad, ups = fn(cy, ccb, ccr, tabs(qt_y), tabs(qt_c))
    assert not bool(bad)
    assert np.array_equal(np.asarray(y), want.coefs[0])
    assert np.array_equal(np.asarray(cb), want.coefs[1])
    assert np.array_equal(np.asarray(cr), want.coefs[2])
    assert np.array_equal(np.asarray(ups[0]), want.upsampled[0])
    assert np.array_equal(np.asarray(ups[1]), want.upsampled[1])


def test_sharded_resident_pad(monkeypatch):
    """Ghost-row resident kernel loop with a mid-shard real bottom
    edge (pad-to-divisible under JPEGQS_PALLAS=1 interpret mode)."""
    monkeypatch.setenv("JPEGQS_PALLAS", "1")
    hb, wb = 13, 8
    coef16, qtbl = _component(hb, wb, seed=49)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=0, niter=2, extra_refresh=0,
        luma=True, use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=0, niter=2,
                             luma=True)
    got, badv = fn(coef16.reshape(hb, wb, 64), jnp.asarray(qraw),
                   jnp.asarray(div), jnp.asarray(x1), jnp.asarray(qshr))
    assert not bool(badv)
    assert np.array_equal(np.asarray(got), want)


def test_engine_auto_sharding_prime_rows(monkeypatch):
    """engine.smooth auto-shards a plane with prime block rows across
    all 8 devices (pad-to-divisible) bit-identically."""
    from util import make_jpeg
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions

    data = make_jpeg(104, 96, "photo", seed=53, color=False, quality=70)
    img = jpegio.read_coefficients(data)
    assert img.components[0].height_in_blocks == 13
    opts = QsOptions.from_quality(3, 2)
    want = engine._smooth_fused(img, opts)
    monkeypatch.setenv("JPEGQS_SHARD_MIN_BLOCKS", "0")
    assert engine._shard_grid(img, opts) == (8, 1)
    got = engine._try_smooth_sharded(img, opts)
    assert got is not None
    for ci in range(len(img.components)):
        assert np.array_equal(got.coefs[ci], want.coefs[ci]), f"comp {ci}"


def test_sharded_resident_diagonals(monkeypatch):
    """Resident-ring sharded loop WITH DIAGONALS (flags=1): the
    242-term in-VMEM ring rebuild under ghost-row sharding — the
    q3-q6 multi-chip production path (quantsmooth.h:1411-1488).  One
    tile per shard keeps the interpret-mode compile small."""
    monkeypatch.setenv("JPEGQS_PALLAS", "1")
    hb, wb = 8, 4
    coef16, qtbl = _component(hb, wb, seed=61)
    qraw = qtbl.astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    want, _, _ = component_smooth(
        jnp.asarray(coef16), jnp.asarray(qraw), jnp.asarray(div),
        jnp.asarray(x1), jnp.asarray(qshr), jnp.zeros((1, 1), jnp.int32),
        hb=hb, wb=wb, flags=1, niter=2, extra_refresh=0,
        luma=True, use_image2=False)
    want = np.asarray(want).reshape(hb, wb, 64)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("row",))
    fn = make_sharded_smooth(mesh, hb=hb, wb=wb, flags=1, niter=2,
                             luma=True)
    got, badv = fn(coef16.reshape(hb, wb, 64), jnp.asarray(qraw),
                   jnp.asarray(div), jnp.asarray(x1), jnp.asarray(qshr))
    assert not bool(badv)
    assert np.array_equal(np.asarray(got), want)


@pytest.mark.skipif(
    jax.default_backend() != "tpu" or len(jax.devices()) < 2,
    reason="needs a real multi-chip TPU slice")
def test_sharded_auto_q6_tpu():
    """Production multi-chip pin: q6 auto-shard on real TPU chips
    (compiled Pallas resident kernels + real ICI ppermute) ==
    single-device engine.  Runs only on a >=2-chip slice."""
    from util import make_jpeg
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu import engine
    from jpegqs_tpu.options import QsOptions
    import os

    data = make_jpeg(256, 256, "photo", seed=67, color=True, quality=70)
    img = jpegio.read_coefficients(data)
    opts = QsOptions.from_quality(6, 3)
    want = engine._smooth_fused(img, opts)
    os.environ["JPEGQS_SHARD_MIN_BLOCKS"] = "0"
    try:
        got = engine._try_smooth_sharded(img, opts)
    finally:
        del os.environ["JPEGQS_SHARD_MIN_BLOCKS"]
    assert got is not None
    for ci in range(len(img.components)):
        assert np.array_equal(got.coefs[ci], want.coefs[ci]), f"comp {ci}"
    if want.upsampled is not None:
        assert np.array_equal(got.upsampled[0], want.upsampled[0])
        assert np.array_equal(got.upsampled[1], want.upsampled[1])
