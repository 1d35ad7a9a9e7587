"""Train-mode BatchNorm with an analytic VJP (channels-last).

Functionally equivalent to ``nnx.BatchNorm(momentum, epsilon)`` (flax
normalization.py: fast-variance stats in float32, stop-gradient running
updates), but the whole BN family is reformulated so XLA emits clean
single-purpose passes:

- forward stats: one fused ``mean`` / ``mean(x^2)`` pair over the
  flattened (N, C) view;
- forward apply: a pure per-channel affine ``x * a + b`` (fuses into the
  adjacent ReLU/conv pad);
- backward: two channel reductions (``sum(gy)``, ``sum(gy * x)``) plus one
  affine pass ``gy * a + x * c2 + c1``.

Rationale: the autodiff backward of the stock BN graph fragments into
multi-operand fusions measured at ~30-50% of HBM bandwidth — ~13 ms/step
across the canonical ResUNet's 20 BN layers (profiler capture,
experiments/profile_out), while a clean channel reduction runs at
~680 GB/s on the same tensors.  Reference semantics: torch BatchNorm2d
(pssr/models/_blocks.py uses nn.BatchNorm2d; torch momentum 0.1 ==
flax/nnx momentum 0.9).
"""

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax

# Cross-device statistics (sync-BN) for the shard_map data-parallel path:
# inside ``sync_axis("data")`` (a trace-time scope, contextvar — no module
# global to leak, VERDICT r2 weak #4), bn_train psums its batch statistics
# over the named mapped axis so every shard normalizes with the GLOBAL
# batch moments — matching the pjit path, where the stats reduction over
# the sharded batch axis is a global reduce by construction.
_SYNC_AXIS = contextvars.ContextVar("pssr2_bn_sync_axis", default=None)


@contextlib.contextmanager
def sync_axis(name: str):
    """Scope under which :func:`bn_train` computes cross-device statistics
    over mapped axis ``name`` (use inside shard_map bodies)."""
    token = _SYNC_AXIS.set(name)
    try:
        yield
    finally:
        _SYNC_AXIS.reset(token)


def current_sync_axis():
    """The active sync/mapped axis name (None outside shard_map DP
    bodies).  Doubles as the general 'per-device program' marker — e.g.
    stochastic-depth draws fold in the axis index so shards decorrelate
    (models/swinir.drop_path_scales)."""
    return _SYNC_AXIS.get()


# Forward-stats formulation (full-step A/B in experiments/mxu_probe36/37/38):
#   "dual"  — one two-output reduce fusion over the (N, C) view (round-2
#             default; profiled at ~2.5x its lane-padded byte floor as
#             XLA's convert_reduce_fusion, results_r3.md)
#   "split" — two independent single-output reduce fusions (reads x twice
#             but each may stream at full bandwidth)
#   "gram"  — sum(x^2) as diag(x^T x) on the MXU plus a ones-row dot for
#             sum(x) (reads x twice, FLOPs ~0.17 ms at C=64 canonical;
#             measured worse, mxu_probe36)
#   "axes"  — the dual fusion over the raw NHWC tensor, reducing axes
#             (0, 1, 2) with NO reshape: the (-1, C) view is a strided
#             walk of the conv emitter's physical layout (C lanes, N
#             sublanes — see results_r3.md), and the collapsed shape
#             pins the fusion emitter's iteration order
#   "tpallas" — the Pallas chanstats kernel fed the TRANSPOSED logical
#             view (N, H, W, C) -> (H, W, N, C) -> (-1, C), whose default
#             row-major layout coincides with the conv emitter's physical
#             activation layout ({3,0,2,1}: C lanes, N sublanes) — the
#             round-2 composed +6.5 ms was the relayout copies the
#             UNtransposed operands forced (mxu_probe16)
STATS_FWD = "axes"
# Backward-stats formulation: same menu for the (sum(gy), sum(gy*x)) pair.
# "axes" fwd+bwd measured the probe38 winner (44.39 -> 43.92 ms canonical
# step, consistent across interleaved trials).
STATS_BWD = "axes"


def _reduce_pair(mode, x, y):
    """[sum(x), sum(x * y)] per channel as two (C,) f32 arrays, formulated
    per ``mode`` (see STATS_FWD).  ``x``/``y`` are the raw channels-last
    tensors (any leading shape)."""
    from .pallas.chanstats import dual_sums

    c = x.shape[-1]
    if mode == "axes":
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        return xf.sum(axes), (xf * y.astype(jnp.float32)).sum(axes)
    if mode == "tpallas" and x.ndim > 2:
        xt = jnp.moveaxis(x, 0, -2).reshape(-1, c)
        yt = jnp.moveaxis(y, 0, -2).reshape(-1, c)
        force = "pallas" if jax.default_backend() == "tpu" else "interpret"
        s = dual_sums(xt, yt, force=force)
        return s[0], s[1]
    x2 = x.reshape(-1, c)
    y2 = y.reshape(-1, c)
    if mode == "split":
        xf = x2.astype(jnp.float32)
        return xf.sum(0), (xf * y2.astype(jnp.float32)).sum(0)
    if mode == "gram":
        n = x2.shape[0]
        s1 = lax.dot_general(
            x2, y2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s0 = lax.dot_general(
            jnp.ones((1, n), x2.dtype), x2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        return s0, jnp.diagonal(s1)
    s = dual_sums(x2, y2)  # one pass: [sum(x), sum(x y)]
    return s[0], s[1]


def _stats(x, axis=None):
    n = x.size // x.shape[-1]
    s0, s1 = _reduce_pair(STATS_FWD, x, x)
    if axis is not None:
        s0 = lax.psum(s0, axis)
        s1 = lax.psum(s1, axis)
        n = n * lax.axis_size(axis)
    mu = s0 / n
    mu2 = s1 / n
    var = jnp.maximum(0.0, mu2 - mu * mu)
    return mu, var


@functools.lru_cache(maxsize=32)
def _bn_train_fn(eps: float, axis):
    """custom_vjp train-BN for a given (epsilon, sync axis).  ``axis`` is a
    mapped-axis name (shard_map sync-BN) or None (single-program path —
    under pjit the stat reduction is global by construction)."""

    @jax.custom_vjp
    def f(x, scale, bias):
        mu, var = _stats(x, axis)
        r = lax.rsqrt(var + eps)
        mul = r * scale.astype(x.dtype)  # f32 * compute-dtype -> f32 (nnx order)
        y = (x - mu) * mul + bias.astype(x.dtype)
        return y.astype(x.dtype), mu, var

    def fwd(x, scale, bias):
        out = f(x, scale, bias)
        _, mu, var = out
        return out, (x, scale, mu, var)

    def bwd(res, g):
        # y = (x - mu) r gamma + beta with mu, var batch statistics of x.
        # With t0 = sum(gy), t1 = sum(gy x), s1 = t1 - mu t0, a = r gamma:
        #   dgamma = s1 r,  dbeta = t0   (LOCAL sums: the shard_map caller
        #   pmean-averages parameter grads — the torch syncBN/DDP split)
        #   dx = a gy + c2 x + c1 with c1/c2 from the GLOBAL (psum'd) sums
        #   and the GLOBAL count: the stat-coupling term must carry every
        #   shard's cotangents.  (Single-program: local == global.)
        #   Includes the mu/var output cotangents gmu, gvar so
        #   stop_gradient at the call site is optional, not load-bearing.
        x, scale, mu, var = res
        gy, gmu, gvar = g
        c = x.shape[-1]
        n = x.size // c
        r = lax.rsqrt(var + eps)
        a = r * scale  # f32

        t0, t1 = _reduce_pair(STATS_BWD, gy, x)  # [sum(gy), sum(gy x)]
        if axis is None:
            tg0, tg1, n_g = t0, t1, n
        else:
            tg0 = lax.psum(t0, axis)
            tg1 = lax.psum(t1, axis)
            n_g = n * lax.axis_size(axis)
        s1 = t1 - mu * t0
        s1_g = tg1 - mu * tg0

        dscale = s1 * r
        dbias = t0
        rr = r * r
        c2 = (-a * rr * s1_g + 2.0 * gvar) / n_g
        c1 = (-a * tg0 + a * rr * mu * s1_g + gmu - 2.0 * gvar * mu) / n_g
        dx = (gy * a.astype(jnp.float32) + x * c2 + c1).astype(x.dtype)
        return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)

    f.defvjp(fwd, bwd)
    return f


def bn_train(x, scale, bias, eps):
    """(y, mean, var) for train-mode BN over the last axis of ``x``.

    ``scale``/``bias`` are float32 params; stats are float32; ``y`` is in
    ``x.dtype`` (matching nnx.BatchNorm's promote-then-normalize path).
    Inside a :func:`sync_axis` scope the statistics (and the backward's
    stat-coupling sums) are psum'd over the mapped axis (sync-BN).
    """
    return _bn_train_fn(float(eps), _SYNC_AXIS.get())(x, scale, bias)


# ---- lane-folded variant ---------------------------------------------------
#
# C<=64 NHWC tensors are physically lane-padded to 128 in HBM (layouts in
# experiments/mxu_probe20.hlo), so every op on the 64-channel @128^2 stages
# moves 2x the bytes.  The lane-fold execution path (models/resunet.py)
# stacks two batch samples along channels (B,C) -> (B/2, 2C); this BN
# computes the IDENTICAL per-true-channel statistics over the folded view
# (the two channel halves are the two sample groups of the same channel)
# with the same analytic-VJP structure as bn_train.


def _fold_sums(s, c):
    return s[:, :c] + s[:, c:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train_folded(x, scale, bias, eps):
    """Train BN over a lane-folded (N, H, W, 2C) tensor whose channel
    halves are two sample groups of the same C true channels.  Returns
    (y folded, mean (C,), var (C,)) — numerically the unfolded statistics
    up to fp reassociation of the half sums."""
    from .pallas.chanstats import dual_sums

    c2ch = x.shape[-1]
    c = c2ch // 2
    x2 = x.reshape(-1, c2ch)
    n = 2 * x2.shape[0]
    s = _fold_sums(dual_sums(x2, x2), c)
    mu = s[0] / n
    var = jnp.maximum(0.0, s[1] / n - mu * mu)
    r = lax.rsqrt(var + eps)
    mul_t = jnp.tile(r * scale.astype(x.dtype), 2)
    mu_t = jnp.tile(mu, 2)
    bias_t = jnp.tile(bias.astype(x.dtype), 2)
    y = (x - mu_t) * mul_t + bias_t
    return y.astype(x.dtype), mu, var


def _bn_train_folded_fwd(x, scale, bias, eps):
    out = bn_train_folded(x, scale, bias, eps)
    _, mu, var = out
    return out, (x, scale, mu, var)


def _bn_train_folded_bwd(eps, res, g):
    # identical algebra to _bn_train_bwd with every channel reduction also
    # summing the two fold halves and the per-channel factors tiled back
    x, scale, mu, var = res
    gy, gmu, gvar = g
    c2ch = x.shape[-1]
    c = c2ch // 2
    n = 2 * (x.size // c2ch)
    r = lax.rsqrt(var + eps)
    a = r * scale

    from .pallas.chanstats import dual_sums

    t = _fold_sums(dual_sums(gy.reshape(-1, c2ch), x.reshape(-1, c2ch)), c)
    t0, t1 = t[0], t[1]
    s1 = t1 - mu * t0

    dscale = s1 * r
    dbias = t0
    rr = r * r
    c2f = (-a * rr * s1 + 2.0 * gvar) / n
    c1f = (-a * t0 + a * rr * mu * s1 + gmu - 2.0 * gvar * mu) / n
    dx = (gy * jnp.tile(a.astype(jnp.float32), 2) + x * jnp.tile(c2f, 2) + jnp.tile(c1f, 2)).astype(x.dtype)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


bn_train_folded.defvjp(_bn_train_folded_fwd, _bn_train_folded_bwd)


class FastBatchNorm(nnx.Module):
    """Drop-in replacement for the project's ``nnx.BatchNorm`` usage
    (channels-last input, float32 params/stats) built on :func:`bn_train`.

    Attribute names (``mean``/``var``/``scale``/``bias``) and semantics
    match ``nnx.BatchNorm`` so checkpoints, torch-twin weight mapping and
    ``model.train()``/``eval()`` toggling are unchanged.
    """

    def __init__(self, num_features, *, momentum=0.9, epsilon=1e-5, dtype=None, rngs=None):
        del rngs  # parity with the nnx.BatchNorm constructor surface
        self.mean = nnx.BatchStat(jnp.zeros((num_features,), jnp.float32))
        self.var = nnx.BatchStat(jnp.ones((num_features,), jnp.float32))
        self.scale = nnx.Param(jnp.ones((num_features,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((num_features,), jnp.float32))
        self.momentum = momentum
        self.epsilon = epsilon
        self.dtype = dtype
        self.use_running_average = False

    def apply_coeffs(self, s1, s2, count):
        """Per-channel affine coefficients ``(a, b)`` (f32, ``y*a + b`` ==
        this BN's output) from PRE-computed raw sums of the pre-BN tensor
        — the seam for conv kernels that emit ``(sum(y), sum(y^2))`` as an
        epilogue (ops/pallas/convchain).  Train mode: batch statistics
        (psum'd over the sync axis inside shard_map DP, matching
        :func:`bn_train`) + the running-stat updates; gradients flow into
        ``s1``/``s2`` through the (C,)-sized algebra (the conv kernel's
        VJP folds them back as stat cotangents).  Eval mode: running
        statistics (``s1``/``s2`` may be None)."""
        scale, bias = self.scale[...], self.bias[...]
        if self.use_running_average:
            a = lax.rsqrt(self.var[...] + self.epsilon) * scale
            return a, bias - self.mean[...] * a
        axis = _SYNC_AXIS.get()
        if axis is not None:
            s1 = lax.psum(s1, axis)
            s2 = lax.psum(s2, axis)
            count = count * lax.axis_size(axis)
        mu = s1 / count
        var = jnp.maximum(0.0, s2 / count - mu * mu)
        m = self.momentum
        self.mean[...] = lax.stop_gradient(m * self.mean[...] + (1 - m) * mu)
        self.var[...] = lax.stop_gradient(m * self.var[...] + (1 - m) * var)
        a = lax.rsqrt(var + self.epsilon) * scale
        return a, bias - mu * a

    def __call__(self, x, folded: bool = False):
        """``folded=True``: x is lane-folded (B/2, H, W, 2C) with channel
        halves = two sample groups; statistics and running updates are the
        per-true-channel ones (see bn_train_folded)."""
        if self.dtype is not None:
            x = x.astype(self.dtype)
        scale, bias = self.scale[...], self.bias[...]
        if self.use_running_average:
            mul = lax.rsqrt(self.var[...] + self.epsilon) * scale.astype(x.dtype)
            mean = self.mean[...]
            if folded:
                mul, mean, bias = jnp.tile(mul, 2), jnp.tile(mean, 2), jnp.tile(bias, 2)
            y = (x - mean) * mul + bias.astype(x.dtype)
            return y.astype(x.dtype)
        fn = bn_train_folded if folded else bn_train
        y, mu, var = fn(x, scale, bias, self.epsilon)
        m = self.momentum
        self.mean[...] = lax.stop_gradient(m * self.mean[...] + (1 - m) * mu)
        self.var[...] = lax.stop_gradient(m * self.var[...] + (1 - m) * var)
        return y
