"""On-device overlap-average stitching of predicted tiles.

Device counterpart of the host patcher (pssr2_tpu.util._patch_images,
reference: pssr/util.py:116-137): tiles are accumulated into the sheet with
static-position adds (XLA fuses the unrolled updates), margins trim inner
tile borders, and the overlap count divides at the end.  Used by
``predict.predict_sheets`` to keep the whole tiled-inference pipeline —
window batch -> model -> stitch — on device.
"""

import jax.numpy as jnp
import numpy as np


def stitch_tiles(tiles: jnp.ndarray, n_rows: int, n_cols: int, overlap: int, margin: int = 0) -> jnp.ndarray:
    """(n_rows*n_cols, C, t, t) tiles -> (C, H, W) overlap-averaged sheet.

    Tile order is row-major (the SlidingDataset tile order); ``overlap`` and
    ``margin`` are in output pixels.  Numerics match the host patcher.
    """
    n, c, th, tw = tiles.shape
    if n != n_rows * n_cols:
        raise ValueError(f"stitch_tiles: {n} tiles != {n_rows}x{n_cols}")
    if margin > overlap:
        raise ValueError(f"margin {margin} cannot exceed overlap {overlap}")

    step_y, step_x = th - overlap, tw - overlap
    height = n_rows * step_y + overlap
    width = n_cols * step_x + overlap

    acc = jnp.zeros((c, height, width), jnp.float32)
    count = np.zeros((height, width), np.float32)

    for idx in range(n):
        row, col = idx // n_cols, idx % n_cols
        m_top = margin if row != 0 else 0
        m_bottom = margin if row != n_rows - 1 else 0
        m_left = margin if col != 0 else 0
        m_right = margin if col != n_cols - 1 else 0

        y0 = row * step_y + m_top
        x0 = col * step_x + m_left
        tile = tiles[idx, :, m_top : th - m_bottom, m_left : tw - m_right].astype(jnp.float32)
        acc = acc.at[:, y0 : y0 + tile.shape[1], x0 : x0 + tile.shape[2]].add(tile)
        count[y0 : y0 + tile.shape[1], x0 : x0 + tile.shape[2]] += 1

    count[count == 0] = 1
    return acc / jnp.asarray(count)
