"""Pallas solver kernel vs the NumPy spec (interpreter mode on CPU).

The compiled kernel is exercised against the reference binary by the
engine differential suite when run on TPU
(JPEGQS_TEST_PLATFORM=axon pytest tests/test_engine.py).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from jpegqs_tpu import specref
from jpegqs_tpu.options import (DIAGONALS, JOINT_YUV, LOW_QUALITY,
                                NO_REBALANCE)
from jpegqs_tpu.ops import planar
from jpegqs_tpu.ops.quant import make_quant_tables
from jpegqs_tpu.ops.pallas_solver import (solve_rebalance, solve_fused,
                                          TILE_BLOCKS)


def _case(flags, do_rebalance, B, seed):
    rng = np.random.default_rng(seed)
    qtbl = rng.integers(1, 120, 64).astype(np.uint16)
    qv = specref.make_quantval192(qtbl)
    div, x1, qshr = make_quant_tables(qtbl)
    tables = specref.make_solver_tables(flags)
    coef = np.clip(rng.integers(-40, 41, (B, 64))
                   * qtbl.astype(np.int32)[None, :], -32768, 32767
                   ).astype(np.int32)
    borders = rng.integers(0, 256, (B, 4, 8)).astype(np.int32)
    want = specref.solve_blocks(coef, borders, qv, flags, tables)
    if do_rebalance:
        want = specref.rebalance_blocks(want, qv)
    got = solve_rebalance(
        jnp.asarray(coef.T),
        tuple(jnp.asarray(borders[:, j].T) for j in range(4)),
        jnp.asarray(div), jnp.asarray(x1), jnp.asarray(qshr),
        flags, do_rebalance, interpret=True)
    got = np.asarray(got).T
    assert np.array_equal(got, want), (
        f"{(got != want).sum()} diffs, first {np.argwhere(got != want)[:3]}")


@pytest.mark.parametrize("flags,do_rebalance", [(0, True), (1, True),
                                                (1, False)])
def test_kernel_matches_spec(flags, do_rebalance):
    _case(flags, do_rebalance, 700, seed=3)


def test_kernel_tile_padding():
    """B not a multiple of the tile size exercises the pad path."""
    _case(0, True, TILE_BLOCKS + 17, seed=9)


def test_kernel_multi_tile():
    _case(1, True, 2 * TILE_BLOCKS + 5, seed=11)


def _fused_case(flags, joint, hb, wb, seed):
    """solve_fused (JOINT/LQ preamble in-kernel) vs the NumPy spec's
    quantsmooth_block_pass on one full block pass."""
    B = hb * wb
    rng = np.random.default_rng(seed)
    qtbl = rng.integers(1, 120, 64).astype(np.uint16)
    qv = specref.make_quantval192(qtbl)
    div, x1, qshr = (jnp.asarray(a) for a in make_quant_tables(qtbl))
    tables = specref.make_solver_tables(flags)
    coef = np.clip(rng.integers(-40, 41, (B, 64))
                   * qtbl.astype(np.int32)[None, :], -32768, 32767
                   ).astype(np.int32)
    coef_p = jnp.asarray(coef.T)
    pix = planar.idct_islow_p(coef_p.reshape(8, 8, B))
    halo = planar.blocks_halo10(pix, hb, wb)
    padded = np.asarray(planar.pix_to_plane(pix, hb, wb))
    if joint:
        ds = jnp.asarray(rng.integers(0, 256, (8, 8, B)), jnp.int32)
        i2halo = planar.blocks_halo10(ds, hb, wb)
        padded2 = np.asarray(planar.pix_to_plane(ds, hb, wb))
    else:
        i2halo, padded2 = None, None
    want = specref.quantsmooth_block_pass(coef, padded, padded2, qv,
                                          flags, tables, True)
    got = solve_fused(coef_p, halo, i2halo, div, x1, qshr, flags,
                      not (flags & NO_REBALANCE), interpret=True)
    got = np.asarray(got).T
    assert np.array_equal(got, want), (
        f"{(got != want).sum()} diffs, first {np.argwhere(got != want)[:3]}")


def test_fused_joint_sweep():
    _fused_case(JOINT_YUV | DIAGONALS, True, 6, 7, seed=5)


def test_fused_joint_low_quality():
    _fused_case(JOINT_YUV | LOW_QUALITY | DIAGONALS, True, 5, 9, seed=6)


def test_fused_low_quality():
    _fused_case(LOW_QUALITY | DIAGONALS, False, 7, 8, seed=7)


def test_fused_no_rebalance():
    _fused_case(LOW_QUALITY | DIAGONALS | NO_REBALANCE, False, 4, 6,
                seed=8)


def test_idct_pix_tiles_bootstrap():
    """The aux-free pixel-bootstrap invocation equals the XLA IDCT in
    tile layout (it seeds the resident iteration loop, replacing the
    engine's iteration-0 idct pass + layout transpose)."""
    from jpegqs_tpu.ops import pallas_solver as ps
    rng = np.random.default_rng(21)
    B = 300
    qtbl = rng.integers(1, 120, 64).astype(np.uint16)
    div, x1, qshr = (jnp.asarray(a) for a in make_quant_tables(qtbl))
    coef = np.clip(rng.integers(-40, 41, (64, B))
                   * qtbl.astype(np.int32)[:, None], -32768, 32767
                   ).astype(np.int32)
    coef_t = ps.tile_blocks(jnp.asarray(coef))
    pix_t = ps.idct_pix_tiles(coef_t, div, x1, qshr, interpret=True)
    got = ps.untile_blocks(pix_t, B).reshape(8, 8, B)
    want = planar.idct_islow_p(jnp.asarray(coef).reshape(8, 8, B))
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_want_pix_matches_idct():
    """The kernel's pixel output equals the IDCT of its coefficient
    output (the engine relies on this to skip the XLA idct pass)."""
    rng = np.random.default_rng(13)
    B = 60
    qtbl = rng.integers(1, 120, 64).astype(np.uint16)
    div, x1, qshr = (jnp.asarray(a) for a in make_quant_tables(qtbl))
    coef = np.clip(rng.integers(-40, 41, (B, 64))
                   * qtbl.astype(np.int32)[None, :], -32768, 32767
                   ).astype(np.int32)
    borders = rng.integers(0, 256, (B, 4, 8)).astype(np.int32)
    out, pix = solve_rebalance(
        jnp.asarray(coef.T),
        tuple(jnp.asarray(borders[:, j].T) for j in range(4)),
        div, x1, qshr, 1, True, interpret=True, want_pix=True)
    want = planar.idct_islow_p(jnp.asarray(out).reshape(8, 8, B))
    assert np.array_equal(np.asarray(pix), np.asarray(want))


# ---------------------------------------------------------------------------
# Resident-pixel kernel variant (aux_mode='pix'): the halo/border lines
# are rebuilt in VMEM from a tile window of the previous pass's pixels
# ---------------------------------------------------------------------------

def _pix_case(hb, wb, seed, joint=False, lq=False, do_reb=True):
    """solve_*_pix (in-kernel halo from resident pixel tiles) must match
    the materialized-halo kernels bit for bit.  Kept to the non-DIAG
    sweep (and LQ for the wide window) so the interpret-mode XLA:CPU
    compiles stay small — the sweep/rebalance bodies themselves are
    covered by the kernel-vs-spec tests above."""
    from jpegqs_tpu.ops import pallas_solver as ps
    B = hb * wb
    rng = np.random.default_rng(seed)
    qtbl = rng.integers(1, 120, 64).astype(np.uint16)
    div, x1, qshr = (jnp.asarray(a) for a in make_quant_tables(qtbl))
    coef = jnp.asarray(np.clip(
        rng.integers(-40, 41, (64, B)) * qtbl.astype(np.int32)[:, None],
        -32768, 32767).astype(np.int32))
    pix = jnp.asarray(rng.integers(0, 256, (8, 8, B)).astype(np.int32))
    flags = LOW_QUALITY if lq else 0
    coef_t = ps.tile_blocks(coef)
    pix_t = ps.tile_blocks(pix.reshape(64, B))
    masks_t = ps.edge_masks(hb, wb)
    halo = planar.blocks_halo10(pix, hb, wb)
    if joint:
        i2 = jnp.asarray(rng.integers(0, 256, (10, 10, B)).astype(np.int32))
        want = solve_fused(coef, halo, i2, div, x1, qshr, flags, do_reb,
                           interpret=True)
        got_t = ps.solve_fused_pix(coef_t, pix_t, masks_t,
                                   ps.tile_blocks(i2.reshape(100, B)),
                                   div, x1, qshr, flags, do_reb, wb,
                                   interpret=True, want_pix=False)
    elif lq:
        want = solve_fused(coef, halo, None, div, x1, qshr, flags, do_reb,
                           interpret=True)
        got_t = ps.solve_fused_pix(coef_t, pix_t, masks_t, None, div, x1,
                                   qshr, flags, do_reb, wb, interpret=True,
                                   want_pix=False)
    else:
        borders = planar.borders_from_blocks(pix, hb, wb)
        want = solve_rebalance(coef, borders, div, x1, qshr, flags, do_reb,
                               interpret=True)
        got_t, pix_out = ps.solve_rebalance_pix(
            coef_t, pix_t, masks_t, div, x1, qshr, flags, do_reb, wb,
            interpret=True)
        want_pix = planar.idct_islow_p(jnp.asarray(want).reshape(8, 8, B))
        assert np.array_equal(
            np.asarray(ps.untile_blocks(pix_out, B).reshape(8, 8, B)),
            np.asarray(want_pix))
    got = ps.untile_blocks(got_t, B)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_pix_mode_plain():
    _pix_case(9, 13, seed=21)


def test_pix_mode_joint():
    _pix_case(9, 13, seed=22, joint=True)


def test_pix_mode_low_quality():
    _pix_case(9, 13, seed=23, lq=True)


def test_pix_mode_wide_window():
    """wb+1 > one tile of lanes forces the (2k+1)-tile window with
    k=2 and index-map clamping at both grid edges.  LQ (full halo, no
    sweep, no rebalance) keeps the interpret-mode program small."""
    _pix_case(2, 1100, seed=24, lq=True, do_reb=False)


def test_pix_mode_batched_masks():
    """n same-shape images concatenated on the block axis: the
    per-image-local edge masks must keep in-kernel neighbor reads from
    crossing image boundaries (batch.py relies on this)."""
    from jpegqs_tpu.ops import pallas_solver as ps
    import jax
    rng = np.random.default_rng(31)
    n, hb, wb = 3, 4, 5
    B = hb * wb
    NB = n * B
    qtbl = rng.integers(1, 120, 64).astype(np.uint16)
    div, x1, qshr = (jnp.asarray(a) for a in make_quant_tables(qtbl))
    coef = jnp.asarray(np.clip(
        rng.integers(-40, 41, (64, NB)) * qtbl.astype(np.int32)[:, None],
        -32768, 32767).astype(np.int32))
    pix = jnp.asarray(rng.integers(0, 256, (8, 8, NB)).astype(np.int32))
    pix_n = pix.reshape(8, 8, n, B)
    halos = jax.vmap(lambda p: planar.blocks_halo10(p, hb, wb),
                     in_axes=2, out_axes=2)(pix_n).reshape(10, 10, NB)
    want = solve_fused(coef, halos, None, div, x1, qshr, LOW_QUALITY,
                       False, interpret=True)
    got_t = ps.solve_fused_pix(
        ps.tile_blocks(coef), ps.tile_blocks(pix.reshape(64, NB)),
        ps.edge_masks(hb, wb, n), None, div, x1, qshr, LOW_QUALITY,
        False, wb, interpret=True, want_pix=False)
    got = ps.untile_blocks(got_t, NB)
    assert np.array_equal(np.asarray(got), np.asarray(want))
