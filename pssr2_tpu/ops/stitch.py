"""On-device overlap-average stitching of predicted tiles.

Device counterpart of the host patcher (pssr2_tpu.util._patch_images,
reference: pssr/util.py:116-137): tiles are accumulated into the sheet and
the overlap count divides at the end; margins trim inner tile borders.

Scalability: the accumulation is a single ``lax.fori_loop`` body doing a
masked dynamic-slice read-modify-write, so program size and compile time
are O(1) in the tile count (a 100x100-tile microscopy sheet compiles the
same program as a 2x2 one).  Edge-dependent margin trimming is expressed
as a 0/1 contribution mask computed inside the loop — shapes stay static,
which is what keeps the loop body compilable.
"""

import jax.numpy as jnp
from jax import lax


def stitch_tiles(tiles: jnp.ndarray, n_rows: int, n_cols: int, overlap: int, margin: int = 0) -> jnp.ndarray:
    """(n_rows*n_cols, C, t, t) tiles -> (C, H, W) overlap-averaged sheet.

    Tile order is row-major (the SlidingDataset tile order); ``overlap`` and
    ``margin`` are in output pixels.  Numerics match the host patcher
    (identical accumulation order).
    """
    n, c, th, tw = tiles.shape
    if n != n_rows * n_cols:
        raise ValueError(f"stitch_tiles: {n} tiles != {n_rows}x{n_cols}")
    if margin > overlap:
        raise ValueError(f"margin {margin} cannot exceed overlap {overlap}")

    step_y, step_x = th - overlap, tw - overlap
    height = n_rows * step_y + overlap
    width = n_cols * step_x + overlap

    iy = jnp.arange(th)[:, None]
    ix = jnp.arange(tw)[None, :]

    def body(idx, carry):
        acc, count = carry
        row, col = idx // n_cols, idx % n_cols
        # interior edges trim `margin`; sheet-border edges keep their rows
        m_top = jnp.where(row != 0, margin, 0)
        m_bottom = jnp.where(row != n_rows - 1, margin, 0)
        m_left = jnp.where(col != 0, margin, 0)
        m_right = jnp.where(col != n_cols - 1, margin, 0)
        mask = (
            (iy >= m_top) & (iy < th - m_bottom) & (ix >= m_left) & (ix < tw - m_right)
        ).astype(jnp.float32)

        tile = lax.dynamic_index_in_dim(tiles, idx, keepdims=False).astype(jnp.float32) * mask
        y0, x0 = row * step_y, col * step_x
        cur = lax.dynamic_slice(acc, (0, y0, x0), (c, th, tw))
        acc = lax.dynamic_update_slice(acc, cur + tile, (0, y0, x0))
        ccur = lax.dynamic_slice(count, (y0, x0), (th, tw))
        count = lax.dynamic_update_slice(count, ccur + mask, (y0, x0))
        return acc, count

    acc = jnp.zeros((c, height, width), jnp.float32)
    count = jnp.zeros((height, width), jnp.float32)
    acc, count = lax.fori_loop(0, n, body, (acc, count))
    return acc / jnp.maximum(count, 1.0)
