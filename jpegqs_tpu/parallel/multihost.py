"""Multi-host execution: jax.distributed plumbing + global-mesh runs.

The reference has no multi-machine story at all — OpenMP shared memory
is its whole parallel stack (quantsmooth.h:2552-2554).  Here the
framework scales out the TPU-native way (SURVEY.md §5):

- ``initialize`` wires the process into a ``jax.distributed`` job
  (coordinator + process id), after which ``jax.devices()`` spans all
  hosts.
- ``smooth_jpeg_distributed``: ONE image sharded over every device in
  the job — block rows first, a (row x col) grid when row divisibility
  alone can't split the plane across the device count — the halo
  ppermutes ride ICI within a slice and DCN across hosts, sitting
  exactly where the reference has its OpenMP barrier.  Every process
  parses the same JPEG bytes and receives the full result
  (allgathered), so any process can re-encode.
- ``smooth_batch_distributed``: per-host image batches on a
  ('data', 'row') mesh — batch DP across hosts on DCN (no cross-image
  communication), row sharding within each host's devices on ICI.

Bit-exactness: the sharded compute path is parallel/sharded.py, which
is bit-identical to the single-device engine; tests/test_multihost.py
proves it across real separate processes (2 x 4 CPU devices).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..options import QsOptions, ITER_MAX, JOINT_YUV, UPSAMPLE_UV
from ..ops.quant import make_quant_tables
from . import sharded as _sh


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kw):
    """Join (or start) a jax.distributed job.

    On TPU pods the arguments are auto-detected from the environment;
    on CPU/GPU fleets pass coordinator ("host:port"), process count
    and id explicitly — see tools/run_multihost.py for a launcher.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def global_row_mesh():
    """A 1-D ('row',) mesh over every device in the job."""
    return Mesh(np.array(jax.devices()), ("row",))


def _full_grid(hbs, wbs, ndev, wbl_for_up=None):
    """(rows, cols) factorization of ndev with rows <= min block rows
    and cols <= min block cols (prefer row-heavy splits — the
    row-sharded flow runs the resident-tile kernel loop), or None when
    the planes are smaller than any full-device grid.  Divisibility is
    NOT required: pad-to-divisible sharding (parallel/sharded.py)
    handles arbitrary row counts, like the reference's OpenMP
    schedule(dynamic) (quantsmooth.h:2586-2588).  ``wbl_for_up``: luma
    block columns when the UPSAMPLE right-tail source must stay
    shard-local (>= 2 local luma block columns)."""
    for r in range(min(ndev, min(hbs)), 0, -1):
        if ndev % r:
            continue
        c = ndev // r
        if c > min(wbs):
            continue
        if c > 1 and wbl_for_up is not None and wbl_for_up // c < 2:
            continue
        return r, c
    return None


def _grid_mesh_global(r, c):
    """A ('row', 'col') mesh over every device in the job."""
    return Mesh(np.array(jax.devices()).reshape(r, c), ("row", "col"))


def data_row_mesh():
    """A ('data', 'row') mesh: hosts x local devices.  Batch DP rides
    DCN (no per-step communication), halo exchange rides ICI."""
    devs = jax.devices()
    nproc = jax.process_count()
    per = len(devs) // nproc
    arr = np.array(devs).reshape(nproc, per)
    return Mesh(arr, ("data", "row"))


def _make_global(arr_np, mesh, spec):
    """Build a global jax.Array from identical host data on every
    process (each process materializes only its addressable shards)."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr_np.shape, sharding, lambda idx: arr_np[idx])


def _gather(x):
    """Allgather a sharded result to an identical np array everywhere."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def smooth_jpeg_distributed(data: bytes, opts: QsOptions = None):
    """Smooth one JPEG across every device of the distributed job.

    Every process calls this with the same bytes; returns
    (SmoothResult, img) with full (allgathered) coefficient planes on
    every process.  Component block-rows must divide the global device
    count (the huge-pano case this exists for always does).
    """
    from ..host.jpegio import read_coefficients
    from .. import engine

    if opts is None:
        opts = QsOptions.from_quality(3, 3)
    img = read_coefficients(data)
    comps = img.components
    ndev = len(jax.devices())
    niter = min(max(opts.niter, 0), ITER_MAX)
    flags = opts.flags

    res = engine.SmoothResult()
    res.coefs = [np.asarray(c.coefs, np.int16).copy() for c in comps]

    def tabs(ci):
        qraw = np.asarray(comps[ci].quantval, np.int32)
        div, x1, qshr = make_quant_tables(qraw)
        return tuple(map(jnp.asarray, (qraw, div, x1, qshr)))

    need_downsample = (
        bool(flags & (JOINT_YUV | UPSAMPLE_UV)) and img.is_ycbcr
        and len(comps) >= 3
        and all(comps[i].h_samp_factor == 1 and comps[i].v_samp_factor == 1
                for i in (1, 2)))

    hbs = [c.height_in_blocks for c in comps]
    wbs = [c.width_in_blocks for c in comps]
    # the >=2-local-luma-columns constraint only binds when the
    # upsample path actually runs (mirrors the do_up gate in
    # sharded.make_sharded_ycbcr_smooth): need_downsample and real
    # subsampling — a raw UPSAMPLE_UV bit on gray/4:4:4 input must not
    # reject an otherwise valid col-grid factorization
    ws0 = comps[0].h_samp_factor
    hs0 = comps[0].v_samp_factor
    up_live = (need_downsample and bool(flags & UPSAMPLE_UV)
               and not (ws0 == 1 and hs0 == 1))
    grid = _full_grid(hbs, wbs, ndev,
                      wbl_for_up=(comps[0].width_in_blocks
                                  if up_live else None))
    if grid is None:
        raise ValueError(
            f"component block grids {list(zip(hbs, wbs))} are smaller "
            f"than any (rows, cols) factorization of {ndev} devices; "
            f"this image is too small for the distributed path — use "
            f"engine.smooth (single process)")
    r, ncol = grid
    mesh = global_row_mesh() if ncol == 1 else _grid_mesh_global(r, ncol)
    col_axis = None if ncol == 1 else "col"
    spec = P("row", col_axis, None)
    if need_downsample and len(comps) == 3:
        y, cb, cr = comps[0], comps[1], comps[2]
        # same eligibility the auto-sharding engine checks
        # (engine._try_smooth_sharded): aligned plane dims.  Refuse
        # loudly rather than crash at trace time.
        aligned = (
            y.height_in_blocks == y.v_samp_factor * cb.height_in_blocks
            and y.width_in_blocks == y.h_samp_factor * cb.width_in_blocks
            and cb.height_in_blocks == cr.height_in_blocks
            and cb.width_in_blocks == cr.width_in_blocks)
        if not aligned:
            raise ValueError(
                "distributed YCbCr color path needs aligned plane dims; "
                "use engine.smooth (single process) for this file")
        fn = _sh.make_sharded_ycbcr_smooth(
            mesh, hb_l=y.height_in_blocks, wb_l=y.width_in_blocks,
            hb_c=cb.height_in_blocks, wb_c=cb.width_in_blocks,
            ws=y.h_samp_factor, hs=y.v_samp_factor, flags=flags,
            niter=niter, img_w=img.width, img_h=img.height,
            col_axis=col_axis)
        # pad non-divisible planes on the host BEFORE building the
        # global arrays (multi-process shards must tile evenly); run()
        # slices the results back to the real dims
        hblp, wblp, hbcp, wbcp = fn.padded_dims
        pdims = [(hblp, wblp), (hbcp, wbcp), (hbcp, wbcp)]
        ins = []
        for c, (hp, wp) in zip(comps, pdims):
            arr = np.asarray(c.coefs, np.int16)
            arr = np.pad(arr, ((0, hp - arr.shape[0]),
                               (0, wp - arr.shape[1]), (0, 0)))
            ins.append(_make_global(arr, mesh, spec))
        oy, ocb, ocr, badv, ups = fn(ins[0], ins[1], ins[2],
                                     tabs(0), tabs(1), tabs(2))
        res.coefs[0] = _gather(oy)
        res.coefs[1] = _gather(ocb)
        res.coefs[2] = _gather(ocr)
        res.stop = int(bool(np.asarray(_gather(badv)).ravel()[0]))
        if ups is not None and not res.stop:
            res.upsampled = (_gather(ups[0]), _gather(ups[1]))
        return res, img

    stop = 0
    for ci, comp in enumerate(comps):
        qraw = np.asarray(comp.quantval, np.int32)
        if not qraw.any():
            continue
        hb, wb = comp.height_in_blocks, comp.width_in_blocks
        if stop:
            # stop propagation (quantsmooth.h:2551-2566): once a
            # component trips the crafted-file guard, later components
            # fall back to plain (unclamped) dequantization
            res.coefs[ci] = np.asarray(engine.dequant_fallback_jit(
                jnp.asarray(res.coefs[ci].reshape(hb * wb, 64)),
                jnp.asarray(qraw))).reshape(hb, wb, 64)
            continue
        fn = _sh.make_sharded_smooth(
            mesh, hb=hb, wb=wb, flags=flags, niter=niter,
            luma=(ci == 0) or not img.is_ycbcr, col_axis=col_axis)
        hp, wp = fn.padded_dims
        arr = np.asarray(comp.coefs, np.int16)
        arr = np.pad(arr, ((0, hp - arr.shape[0]),
                           (0, wp - arr.shape[1]), (0, 0)))
        coef = _make_global(arr, mesh, spec)
        qraw_j, div, x1, qshr = tabs(ci)
        out, badv = fn(coef, qraw_j, div, x1, qshr)
        # the tripping component's result already carries the clamped
        # dequant fallback (merged in on device, parallel/sharded.py)
        res.coefs[ci] = _gather(out).astype(np.int16)
        if bool(np.asarray(_gather(badv)).ravel()[0]):
            stop = 1
    res.stop = stop
    return res, img


def smooth_batch_distributed(coefs_local, qtbl, flags, niter,
                             luma=True):
    """Per-host image batches on the ('data', 'row') mesh.

    Each process passes its LOCAL batch coefs int16[n_loc, hb, wb, 64]
    (same shape/qtable everywhere — the bucketed-corpus contract).
    Returns this process's local results int16[n_loc, hb, wb, 64]:
    batch DP across hosts needs no gather.
    """
    from jax.experimental import multihost_utils

    mesh = data_row_mesh()
    coefs_local = np.ascontiguousarray(coefs_local, np.int16)
    n_loc, hb, wb, _ = coefs_local.shape
    qraw = np.asarray(qtbl, np.int32)
    div, x1, qshr = make_quant_tables(qraw)
    fn = _sh.make_sharded_smooth(mesh, hb=hb, wb=wb, flags=flags,
                                 niter=niter, luma=luma,
                                 batch_axis="data")
    # pad non-divisible block rows before the local->global conversion
    # (even shards required); run() slices the result back to hb x wb
    hp, wp = fn.padded_dims
    coefs_local = np.pad(coefs_local, ((0, 0), (0, hp - hb),
                                       (0, wp - wb), (0, 0)))
    batch = multihost_utils.host_local_array_to_global_array(
        coefs_local, mesh, P("data", "row", None, None))
    out, badv = fn(batch, jnp.asarray(qraw), jnp.asarray(div),
                   jnp.asarray(x1), jnp.asarray(qshr))
    # the sliced result no longer row-tiles evenly; fetch it per-host
    # on the batch axis only (rows replicated within each host)
    local = multihost_utils.global_array_to_host_local_array(
        out, mesh, P("data", None, None, None))
    return np.asarray(local).astype(np.int16)
