"""Pallas TPU kernel for the differentiable (sigmoid-binned) histogram.

The XLA formulation (pssr2_tpu.ops.gradhist, mirroring the reference's
GradHist at pssr/models/_blocks.py:94-112) materializes a (B, bins+1, N)
intermediate — >0.5 GB at learned-crappifier training shapes (B=16,
bins=512, N=128*128).  This kernel streams value chunks through VMEM and
accumulates the (B, bins) histogram, with a matching streaming backward:

  forward:  hist_k = sum_n  s_{k-1}(n) - s_k(n),   s_k = sigmoid((v - c_k) * sigma),  s_{-1} = 1
  backward: dL/dv_n = sigma * sum_k (g_{k+1} - g_k) * s_k(n) * (1 - s_k(n))

Blocks carry the full batch dim (TPU sublane rule) and a chunk of values;
the live (B, CHUNK, bins) sigmoid tile is sized to a VMEM budget.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 4 * 1024 * 1024  # bytes for the (B, CHUNK, bins) f32 tile


def _chunk_size(b: int, bins: int) -> int:
    chunk = _VMEM_BUDGET // (4 * b * bins)
    chunk = max(128, (chunk // 128) * 128)
    return min(chunk, 2048)


def _fwd_kernel(values_ref, centers_ref, sigma_ref, out_ref):
    """grid = (N // CHUNK,); accumulate per-bin mass for one value chunk."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    v = values_ref[...]  # (B, CHUNK)
    c = centers_ref[...]  # (1, bins)
    sigma = sigma_ref[0, 0]

    s = jax.nn.sigmoid((v[:, :, None] - c.reshape(1, 1, -1)) * sigma)  # (B, CHUNK, bins)
    mass = jnp.sum(s, axis=1)  # (B, bins)
    # hist_k = sum_n (s_{k-1} - s_k); the s_{-1}=1 terms total CHUNK per row
    n = jnp.float32(v.shape[-1])
    prev = jnp.concatenate([jnp.full((mass.shape[0], 1), n, mass.dtype), mass[:, :-1]], axis=1)
    out_ref[...] += prev - mass


def _bwd_kernel(values_ref, centers_ref, sigma_ref, gdiff_ref, dv_ref):
    """grid = (N // CHUNK,); dL/dv for one value chunk.
    gdiff holds (g_{k+1} - g_k) per bin."""
    v = values_ref[...]  # (B, CHUNK)
    c = centers_ref[...]
    sigma = sigma_ref[0, 0]
    gdiff = gdiff_ref[...]  # (B, bins)

    s = jax.nn.sigmoid((v[:, :, None] - c.reshape(1, 1, -1)) * sigma)  # (B, CHUNK, bins)
    t = s * (1.0 - s)
    dv_ref[...] = sigma * jnp.sum(t * gdiff[:, None, :], axis=2)  # (B, CHUNK)


def _pad_to_chunk(flat, chunk):
    n = flat.shape[-1]
    pad = (-n) % chunk
    if pad:
        # pad far below all bin centers: s_k ~ 0 for all k, so padded mass
        # telescopes into bin 0 via the s_{-1}=1 term — corrected afterwards.
        flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=-1e9)
    return flat, pad


def _run_fwd(values, centers, sigma, interpret):
    b, n = values.shape
    bins = centers.shape[-1]
    chunk = _chunk_size(b, bins)
    grid = (n // chunk,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, chunk), lambda j: (0, j)),
            pl.BlockSpec((1, bins), lambda j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((b, bins), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, bins), jnp.float32),
        interpret=interpret,
    )(values, centers, jnp.full((1, 1), sigma, jnp.float32))


def _run_bwd(values, centers, sigma, gdiff, interpret):
    b, n = values.shape
    bins = centers.shape[-1]
    chunk = _chunk_size(b, bins)
    grid = (n // chunk,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, chunk), lambda j: (0, j)),
            pl.BlockSpec((1, bins), lambda j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, bins), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b, chunk), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        interpret=interpret,
    )(values, centers, jnp.full((1, 1), sigma, jnp.float32), gdiff)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def gradhist_pallas(values, centers, sigma, interpret=False):
    """Streaming soft histogram: (B, N) float32 -> (B, bins) float32.

    ``centers`` is a static tuple of bin centers; ``sigma`` the sharpness.
    Matches pssr2_tpu.ops.gradhist.GradHist numerics.
    """
    c = jnp.asarray(centers, jnp.float32).reshape(1, -1)
    b = values.shape[0]
    chunk = _chunk_size(b, c.shape[-1])
    flat, pad = _pad_to_chunk(values, chunk)
    out = _run_fwd(flat, c, sigma, interpret)
    if pad:
        # remove the padded values' telescoped mass from bin 0
        out = out.at[:, 0].add(-float(pad))
    return out


def _vjp_fwd(values, centers, sigma, interpret):
    return gradhist_pallas(values, centers, sigma, interpret), values


def _vjp_bwd(centers, sigma, interpret, values, g):
    # gdiff_k = g_{k+1} - g_k  (g_bins = 0)
    gdiff = jnp.concatenate([g[:, 1:], jnp.zeros_like(g[:, :1])], axis=1) - g
    c = jnp.asarray(centers, jnp.float32).reshape(1, -1)
    b = values.shape[0]
    chunk = _chunk_size(b, c.shape[-1])
    flat, pad = _pad_to_chunk(values, chunk)
    dv = _run_bwd(flat, c, sigma, gdiff.astype(jnp.float32), interpret)
    if pad:
        dv = dv[:, : values.shape[-1]]
    return (dv,)


gradhist_pallas.defvjp(_vjp_fwd, _vjp_bwd)


class GradHistPallas:
    """Drop-in for :class:`pssr2_tpu.ops.gradhist.GradHist` backed by the
    streaming Pallas kernel (TPU) or interpret mode (CPU tests)."""

    def __init__(self, bins: int = 512, range=(-256, 256), sigma: float = 5.0, interpret: bool = None):
        assert range[1] > range[0]
        delta = float(range[1] - range[0]) / float(bins)
        self.centers = tuple(
            (float(range[0]) + delta * (np.arange(bins, dtype=np.float64) + 0.5)).tolist()
        )
        self.sigma = float(sigma)
        self.bins = bins
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

    def __call__(self, x):
        b = x.shape[0]
        flat = x.reshape(b, -1).astype(jnp.float32)
        return gradhist_pallas(flat, self.centers, self.sigma, self.interpret)
