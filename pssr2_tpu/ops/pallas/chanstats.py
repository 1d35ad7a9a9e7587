"""Pallas TPU kernel: fused per-channel sums over a (N, C) view.

``dual_sums(x, y) -> (2, C) f32 = [sum(x), sum(x * y)]`` in ONE pass over
the operands.  The BatchNorm family needs exactly this shape of reduction
twice per layer (forward: ``sum(x), sum(x^2)``; backward:
``sum(gy), sum(gy * x)``); as separate XLA fusions each operand is read
twice and the fusions were measured at ~125-250 GB/s inside the train
step, while a single clean pass streams at ~680 GB/s
(experiments/results_r2.md).

Grid streams row chunks through VMEM and accumulates into a revisited
(2, C) float32 output (same pattern as ops/pallas/gradhist.py).  Falls
back to plain jnp sums off-TPU or when the row count doesn't tile.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128
_VMEM_ROW_BUDGET = 1 << 21  # bytes per operand block

# Global default when ``force`` is None.  "jnp" everywhere: inside the
# real train step the pallas_call's operand layout constraints force
# relayout copies of every activation and cost +6.5 ms/step (measured,
# experiments/mxu_probe16 vs 15) — another standalone-vs-composed reversal
# (see CLAUDE.md).  The kernel is kept for standalone/streaming use
# (force="pallas").  Mesh training must stay "jnp" regardless: a
# pallas_call is not SPMD-partitionable (SURVEY.md hard-parts: BN in pjit).
AUTO_MODE = "jnp"


def _chunk_rows(n_rows: int, c: int, itemsize: int) -> int:
    # VMEM blocks pad the minor dim to the 128-lane tile: a (chunk, 1)
    # block physically occupies chunk x 128 elements, so budget by the
    # PADDED width (this OOM'd scoped vmem on the C=1 input-stage BN).
    width = ((c + _LANES - 1) // _LANES) * _LANES
    chunk = _VMEM_ROW_BUDGET // max(1, width * itemsize)
    chunk = max(8, (chunk // 8) * 8)
    while chunk > 8 and n_rows % chunk:
        chunk //= 2
    return chunk


def _dual_sums_kernel(x_ref, y_ref, out_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xv = x_ref[...].astype(jnp.float32)
    yv = y_ref[...].astype(jnp.float32)
    out_ref[0, :] += jnp.sum(xv, axis=0)
    out_ref[1, :] += jnp.sum(xv * yv, axis=0)


def _dual_sums_jnp(x, y):
    xf = x.astype(jnp.float32)
    return jnp.stack([xf.sum(0), (xf * y.astype(jnp.float32)).sum(0)])


def dual_sums(x, y, force: str = None):
    """[sum(x, 0), sum(x * y, 0)] as (2, C) float32 for (N, C) operands.

    ``force``: None (auto: Pallas on TPU when shapes tile), "pallas",
    "jnp", or "interpret" (Pallas interpreter, for CPU tests).
    """
    n, c = x.shape
    mode = force if force is not None else AUTO_MODE
    if mode == "auto":
        # c >= 64: narrower channel counts waste >=half the VPU lanes in
        # VMEM (C=1 runs at 1/128) — the jnp reduction handles those.
        tpu = jax.default_backend() == "tpu"
        mode = "pallas" if (tpu and n % 8 == 0 and n >= 64 and c >= 64) else "jnp"
    if mode == "jnp":
        return _dual_sums_jnp(x, y)

    chunk = _chunk_rows(n, c, x.dtype.itemsize)
    if n % chunk:
        return _dual_sums_jnp(x, y)
    grid = (n // chunk,)
    return pl.pallas_call(
        _dual_sums_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, c), lambda j: (j, 0)),
            pl.BlockSpec((chunk, c), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((2, c), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=(mode == "interpret"),
    )(x, y)
