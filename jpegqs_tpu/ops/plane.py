"""Pixel-plane layout ops: block grid <-> padded plane, borders, downsample.

The padded plane (+1px replicated border) is the reference's scratch
image (quantsmooth.h:2544-2567, border fill 2612-2620); the per-block
border lines are the 1-pixel halo every block reads from its neighbors
(quantsmooth.h:1396-1401).  This halo is the only cross-block coupling,
and therefore the only cross-shard traffic when a plane is sharded
across chips (see parallel/).
"""

from __future__ import annotations

import jax.numpy as jnp

I32 = jnp.int32


def blocks_to_plane(pix_blocks, hb, wb):
    """int32[B,8,8] -> padded plane int32[hb*8+2, wb*8+2] with 1px
    replicated border (reference: quantsmooth.h:2612-2620)."""
    interior = pix_blocks.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3)
    interior = interior.reshape(hb * 8, wb * 8)
    return jnp.pad(interior, 1, mode="edge")


def plane_block_borders(padded, hb, wb):
    """The four 8-pixel border lines adjacent to each block
    (reference: quantsmooth.h:1396-1401): top,bottom,left,right ->
    int32[B, 4, 8]."""
    H, W = hb * 8, wb * 8
    top = padded[0:H:8, 1:W + 1].reshape(hb, 1, wb, 8)
    bot = padded[9:H + 2:8, 1:W + 1].reshape(hb, 1, wb, 8)
    left = padded[1:H + 1, 0:W:8].reshape(hb, 8, wb, 1)
    right = padded[1:H + 1, 9:W + 2:8].reshape(hb, 8, wb, 1)
    top = top.transpose(0, 2, 1, 3).reshape(hb * wb, 8)
    bot = bot.transpose(0, 2, 1, 3).reshape(hb * wb, 8)
    left = left.transpose(0, 2, 3, 1).reshape(hb * wb, 8)
    right = right.transpose(0, 2, 3, 1).reshape(hb * wb, 8)
    return jnp.stack([top, bot, left, right], axis=1).astype(I32)


def plane_to_blocks(padded, hb, wb):
    """Interior of a padded plane -> [B, 8, 8] blocks."""
    H, W = hb * 8, wb * 8
    interior = padded[1:H + 1, 1:W + 1]
    return interior.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(
        hb * wb, 8, 8)


def plane_to_fblocks(fplane, hb, wb):
    """Unpadded f32 plane [hb*8, wb*8] -> f32[B, 8, 8] blocks."""
    return fplane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(
        hb * wb, 8, 8)


def downsample_plane(padded_luma, hb_l, wb_l, hb_c, wb_c, ws, hs):
    """Box-downsample the padded luma plane to chroma-size for JOINT_YUV
    (reference: quantsmooth.h:2753-2813).  Returns a padded (+1px)
    chroma-size plane.  ws/hs are static sampling factors.

    Integer math throughout: order-independent, exact.
    """
    H, W = hb_l * 8, wb_l * 8
    interior = padded_luma[1:H + 1, 1:W + 1].astype(I32)
    w1 = (W + ws - 1) // ws
    h1 = (H + hs - 1) // hs
    wc, hc = wb_c * 8, hb_c * 8
    if ws == 2 and hs == 2:
        # fast path (quantsmooth.h:2778-2785): (a + 2) >> 2
        a = (interior[0:h1 * 2:2, 0:w1 * 2:2]
             + interior[0:h1 * 2:2, 1:w1 * 2:2]
             + interior[1:h1 * 2:2, 0:w1 * 2:2]
             + interior[1:h1 * 2:2, 1:w1 * 2:2])
        ds = (a + 2) >> 2
    else:
        # General path: zero-pad to a multiple of the sampling factor,
        # box-sum, divide by the per-cell true pixel count
        # (w2*h2, quantsmooth.h:2790-2800: (sum + div/2) / div).
        ph, pw = h1 * hs, w1 * ws
        z = jnp.zeros((ph, pw), dtype=I32)
        z = z.at[:H, :W].set(interior)
        s = z.reshape(h1, hs, w1, ws).sum(axis=(1, 3))
        cnt_y = jnp.minimum(jnp.arange(h1, dtype=I32) * 0 + hs,
                            H - jnp.arange(h1, dtype=I32) * hs)
        cnt_x = jnp.minimum(jnp.arange(w1, dtype=I32) * 0 + ws,
                            W - jnp.arange(w1, dtype=I32) * ws)
        div = cnt_y[:, None] * cnt_x[None, :]
        ds = (s + div // 2) // div
    out = jnp.zeros((hc + 2, wc + 2), dtype=I32)
    out = out.at[1:h1 + 1, 1:w1 + 1].set(ds)
    # replicate (quantsmooth.h:2805-2813): left col, right cols from
    # col w1, then top row, bottom rows from row h1
    out = out.at[1:h1 + 1, 0].set(out[1:h1 + 1, 1])
    out = out.at[1:h1 + 1, w1 + 1:].set(out[1:h1 + 1, w1:w1 + 1])
    out = out.at[0, :].set(out[1, :])
    out = out.at[h1 + 1:, :].set(out[h1, :][None, :])
    return out
