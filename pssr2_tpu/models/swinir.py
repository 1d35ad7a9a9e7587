"""SwinIR (Liang et al., 2021) in NNX/NHWC (reference: pssr/models/swinir.py).

Architecture parity with the reference's vendored SwinIR: shifted-window
attention with relative position bias, RSTB residual groups, the four
upsampler heads, pad-to-window-multiple, and the PSSR convention that the
model operates directly on [0,255] values (img_range=1, mean=0;
reference: swinir.py:96-101, forward at :208-261).

TPU-first details:
- token tensors are (B, L, C); window attention is batched einsum over
  64-token windows (MXU-friendly; no torch-style loops)
- attention masks for shifted windows are trace-time numpy constants
  (shapes are static under jit)
- ``use_checkpoint`` lowers to jax.checkpoint (rematerialization) over
  transformer blocks (reference: swinir.py:505-508).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..ops.shuffle import pixel_shuffle
from .blocks import conv as _torch_conv
from .blocks import force_list

trunc_normal_init = jax.nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def _linear(in_f, out_f, *, rngs, use_bias=True, dtype=None):
    return nnx.Linear(
        in_f,
        out_f,
        use_bias=use_bias,
        kernel_init=trunc_normal_init,
        bias_init=jax.nn.initializers.zeros,
        dtype=dtype,
        rngs=rngs,
    )


def window_partition(x, window_size):
    """(B, H, W, C) -> (num_windows*B, ws, ws, C) (reference: swinir.py:472-485)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size, window_size, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, c)


def window_reverse(windows, window_size, h, w):
    """Inverse of :func:`window_partition` (reference: swinir.py:487-500)."""
    b = windows.shape[0] // (h * w // window_size // window_size)
    x = windows.reshape(b, h // window_size, w // window_size, window_size, window_size, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


@functools.lru_cache(maxsize=32)
def _relative_position_index(wh, ww):
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    coords_flat = coords.reshape(2, -1)
    relative = coords_flat[:, :, None] - coords_flat[:, None, :]
    relative = relative.transpose(1, 2, 0)
    relative[:, :, 0] += wh - 1
    relative[:, :, 1] += ww - 1
    relative[:, :, 0] *= 2 * ww - 1
    return relative.sum(-1)  # (wh*ww, wh*ww)


@functools.lru_cache(maxsize=64)
def _shift_attn_mask(h, w, window_size, shift_size):
    """Attention mask for shifted windows (reference: swinir.py:310-328),
    computed as a numpy constant at trace time."""
    if shift_size == 0:
        return None
    img_mask = np.zeros((1, h, w, 1))
    h_slices = (slice(0, -window_size), slice(-window_size, -shift_size), slice(-shift_size, None))
    w_slices = h_slices
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    b, hh, ww, c = img_mask.shape
    mask_windows = img_mask.reshape(b, hh // window_size, window_size, ww // window_size, window_size, c)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size * window_size)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return attn_mask  # (nW, N, N)


class Mlp(nnx.Module):
    def __init__(self, in_features, hidden_features, drop=0.0, *, rngs, dtype=None):
        self.fc1 = _linear(in_features, hidden_features, rngs=rngs, dtype=dtype)
        self.fc2 = _linear(hidden_features, in_features, rngs=rngs, dtype=dtype)
        self.drop = nnx.Dropout(drop, rngs=rngs) if drop > 0 else None

    def __call__(self, x):
        x = nnx.gelu(self.fc1(x), approximate=False)
        if self.drop is not None:
            x = self.drop(x)
        x = self.fc2(x)
        if self.drop is not None:
            x = self.drop(x)
        return x


class WindowAttention(nnx.Module):
    """W-MSA with relative position bias (reference: swinir.py:516-597)."""

    def __init__(self, dim, window_size, num_heads, qkv_bias=True, qk_scale=None, attn_drop=0.0, proj_drop=0.0, *, rngs, dtype=None):
        self.dim = dim
        self.window_size = window_size  # (wh, ww)
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = qk_scale or head_dim**-0.5

        n_bias = (2 * window_size[0] - 1) * (2 * window_size[1] - 1)
        self.relative_position_bias_table = nnx.Param(
            trunc_normal_init(rngs.params(), (n_bias, num_heads), jnp.float32)
        )
        self.qkv = _linear(dim, dim * 3, use_bias=qkv_bias, rngs=rngs, dtype=dtype)
        self.proj = _linear(dim, dim, rngs=rngs, dtype=dtype)
        self.attn_drop = nnx.Dropout(attn_drop, rngs=rngs) if attn_drop > 0 else None
        self.proj_drop = nnx.Dropout(proj_drop, rngs=rngs) if proj_drop > 0 else None
        # Toggled by model.train()/model.eval() (nnx.set_attributes).  The
        # fused Pallas attention/block kernels are inference-only: their
        # custom VJP recomputes the full reference XLA forward, so taking
        # them under training pays kernel fwd + XLA fwd + XLA bwd — strictly
        # slower than the plain XLA path, which stores its intermediates.
        # Gating on eval also keeps training numerics exactly the XLA
        # reference math (the kernels are bf16-rounding-class equivalent).
        self.deterministic = False

    def _bias(self, n):
        idx = _relative_position_index(*self.window_size).reshape(-1)
        return self.relative_position_bias_table.value[idx].reshape(n, n, -1).transpose(2, 0, 1)

    def forward_image(self, x_img, mask_spec=None):
        """Image-layout attention (B, H, W, C) -> (B, H, W, C): windows are
        consumed in place by the 2-D fused kernel — no window_partition/
        reverse and no operand relayout (~12 ms/step of copies at batch-16
        inference, experiments/profile_swinir2).  Caller guarantees
        eligibility (ops/pallas/winattn.eligible_2d)."""
        from ..ops.pallas import winattn

        ws = self.window_size[0]
        qkv = self.qkv(x_img)
        out = winattn.fused_window_attention_2d(
            qkv, self._bias(ws * ws), mask_spec, self.scale, self.num_heads, ws
        )
        out = self.proj(out)
        if self.proj_drop is not None:
            out = self.proj_drop(out)
        return out

    def __call__(self, x, mask=None, mask_spec=None):
        b_, n, c = x.shape
        qkv = self.qkv(x)  # (b_, n, 3c), features ordered q | k | v
        bias = self._bias(n)

        from ..ops.pallas import winattn

        nw = None if mask is None else mask.shape[0]
        if self.deterministic and self.attn_drop is None and winattn.eligible(b_, n, c, self.num_heads, nw):
            # Fused Pallas path: softmax(qk+bias[+mask])v per window in
            # VMEM — the XLA lowering materializes the (W,h,n,n) maps in
            # HBM and relayouts qkv per block (~57 ms/step of copies at
            # batch-16 inference, experiments/profile_swinir).  Backward
            # recomputes through the reference einsum (exact autodiff).
            x = winattn.fused_window_attention(
                qkv, bias, mask_spec if mask is not None else None, self.scale, self.num_heads
            )
        else:
            # token-major einsum formulation (identical math to the
            # reference's q k^T / attn v, reference: swinir.py:516-597)
            qkv_r = qkv.reshape(b_, n, 3, self.num_heads, c // self.num_heads)
            q, k, v = qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2]  # (b_, n, h, d)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * self.scale, k)
            attn = attn + bias[None].astype(attn.dtype)
            if mask is not None:
                attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n) + mask[None, :, None].astype(attn.dtype)
                attn = attn.reshape(-1, self.num_heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            if self.attn_drop is not None:
                attn = self.attn_drop(attn)
            x = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b_, n, c)
        x = self.proj(x)
        if self.proj_drop is not None:
            x = self.proj_drop(x)
        return x


class DropPathTok(nnx.Module):
    """Stochastic depth over (B, L, C) tokens."""

    def __init__(self, rate, *, rngs):
        self.drop = nnx.Dropout(rate, broadcast_dims=(1, 2), rngs=rngs) if rate > 0 else None

    def __call__(self, x):
        return x if self.drop is None else self.drop(x)


class SwinTransformerBlock(nnx.Module):
    """(reference: swinir.py:270-389)"""

    def __init__(self, dim, input_resolution, num_heads, window_size=7, shift_size=0, mlp_ratio=4.0,
                 qkv_bias=True, qk_scale=None, drop=0.0, attn_drop=0.0, drop_path=0.0, *, rngs, dtype=None):
        self.dim = dim
        self.input_resolution = input_resolution
        self.num_heads = num_heads
        self.window_size = window_size
        self.shift_size = shift_size
        self.mlp_ratio = mlp_ratio
        if min(input_resolution) <= window_size:
            self.shift_size = 0
            self.window_size = min(input_resolution)
        assert 0 <= self.shift_size < self.window_size

        self.norm1 = nnx.LayerNorm(dim, dtype=dtype, rngs=rngs)
        self.attn = WindowAttention(
            dim, (self.window_size, self.window_size), num_heads, qkv_bias, qk_scale, attn_drop, drop,
            rngs=rngs, dtype=dtype,
        )
        self.drop_path = DropPathTok(drop_path, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, dtype=dtype, rngs=rngs)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), drop, rngs=rngs, dtype=dtype)

    def _fused_params(self):
        a = self.attn
        wqkv = a.qkv.kernel.value
        bqkv = (
            a.qkv.bias.value
            if a.qkv.bias is not None
            else jnp.zeros((wqkv.shape[1],), wqkv.dtype)
        )
        return (
            self.norm1.scale.value, self.norm1.bias.value, wqkv, bqkv,
            a.proj.kernel.value, a.proj.bias.value,
            self.norm2.scale.value, self.norm2.bias.value,
            self.mlp.fc1.kernel.value, self.mlp.fc1.bias.value,
            self.mlp.fc2.kernel.value, self.mlp.fc2.bias.value,
            a._bias(self.window_size * self.window_size),
        )

    def _chain_realign(self, x_img, v_in):
        """(x_img', delta) for the roll-space chain step from offset
        ``v_in`` to this block's shift.  The kernel's ``delta`` is the
        mod-window residue, but roll arithmetic is mod the IMAGE size:
        the multiple-of-ws remainder (p = delta - (s - v_in), i.e. +ws
        exactly when an un-shift follows a shift) must be applied as an
        explicit roll.  Window attention is roll-by-ws equivariant, so
        dropping p leaves every later block in the group displaced by ws
        in roll space while the forward only drifts through the (small)
        relative-position-bias association and the RSTB residual
        misalignment — the r4 convergence gate caught it as a systematic
        -0.12 dB training endpoint cost (results_r4.md)."""
        s = self.shift_size
        delta = (s - v_in) % self.window_size
        p = delta - (s - v_in)
        if p:
            x_img = jnp.roll(x_img, (p, p), axis=(1, 2))
        return x_img, delta

    def forward_rolled(self, x_img, v_in):
        """Whole-block fused path (ops/pallas/swinblock): input (B, H, W, C)
        at roll offset ``v_in``, output at this block's shift offset —
        shifted windows cost zero extra passes because the roll is absorbed
        into the kernel's strip assembly.  Caller chains offsets and
        applies one final roll per BasicLayer."""
        from ..ops.pallas import swinblock

        s = self.shift_size
        x_img, delta = self._chain_realign(x_img, v_in)
        out = swinblock.fused_swin_block(
            x_img,
            self._fused_params(),
            heads=self.num_heads,
            scale=self.attn.scale,
            ws=self.window_size,
            delta=delta,
            shift=s,
            mask_hw=(x_img.shape[1], x_img.shape[2]) if s else None,
            eps=self.norm1.epsilon,
        )
        return out, s

    def forward_rolled_train(self, x_img, v_in, s1, s2):
        """Training twin of :func:`forward_rolled`: fused forward with
        per-sample DropPath keep-scales plus the fused whole-block VJP
        kernel for the backward (ops/pallas/swinblock
        fused_swin_block_train)."""
        from ..ops.pallas import swinblock

        s = self.shift_size
        x_img, delta = self._chain_realign(x_img, v_in)
        out = swinblock.fused_swin_block_train(
            x_img,
            self._fused_params(),
            s1,
            s2,
            heads=self.num_heads,
            scale=self.attn.scale,
            ws=self.window_size,
            delta=delta,
            shift=s,
            mask_hw=(x_img.shape[1], x_img.shape[2]) if s else None,
            eps=self.norm1.epsilon,
        )
        return out, s

    def drop_path_scales(self, b):
        """Two (B,) stochastic-depth keep-scales (mask / keep_prob), drawn
        from the block's own dropout stream — the per-sample semantics of
        DropPathTok (nnx.Dropout with broadcast_dims=(1, 2)) for the fused
        train chain.  Ones when stochastic depth is off."""
        d = self.drop_path.drop
        if d is None or d.deterministic or d.rate == 0.0:
            ones = jnp.ones((b,), jnp.float32)
            return ones, ones
        keep = 1.0 - d.rate
        from ..ops.batchnorm import current_sync_axis

        ax = current_sync_axis()

        def draw():
            k = d.rngs()
            if ax is not None:
                # shard_map DP: the rng state is replicated, so fold the
                # device index in — shards must not share masks
                k = jax.random.fold_in(k, jax.lax.axis_index(ax))
            m = jax.random.bernoulli(k, keep, (b,))
            return m.astype(jnp.float32) / keep

        return draw(), draw()

    def __call__(self, x, x_size):
        h, w = x_size
        b, _, c = x.shape

        shortcut = x
        x = self.norm1(x)
        x = x.reshape(b, h, w, c)

        if self.shift_size > 0:
            x = jnp.roll(x, (-self.shift_size, -self.shift_size), axis=(1, 2))

        from ..ops.pallas import winattn

        mask = _shift_attn_mask(h, w, self.window_size, self.shift_size)
        mask_spec = (h, w, self.window_size, self.shift_size)
        if self.attn.deterministic and self.attn.attn_drop is None and winattn.eligible_2d(
            b, h, w, c, self.num_heads, self.window_size
        ):
            # image-layout fused attention: windows consumed in place
            x = self.attn.forward_image(x, mask_spec if mask is not None else None)
        else:
            x_windows = window_partition(x, self.window_size)
            x_windows = x_windows.reshape(-1, self.window_size * self.window_size, c)
            attn_windows = self.attn(
                x_windows,
                mask=None if mask is None else jnp.asarray(mask),
                mask_spec=mask_spec,
            )
            attn_windows = attn_windows.reshape(-1, self.window_size, self.window_size, c)
            x = window_reverse(attn_windows, self.window_size, h, w)

        if self.shift_size > 0:
            x = jnp.roll(x, (self.shift_size, self.shift_size), axis=(1, 2))
        x = x.reshape(b, h * w, c)

        x = shortcut + self.drop_path(x)
        x = x + self.drop_path(self.mlp(self.norm2(x)))
        return x


class PatchEmbed(nnx.Module):
    """Image -> tokens (reference: swinir.py:641-672)."""

    def __init__(self, embed_dim, norm_layer=True, *, rngs, dtype=None):
        self.norm = nnx.LayerNorm(embed_dim, dtype=dtype, rngs=rngs) if norm_layer else None

    def __call__(self, x):
        # NHWC image -> (B, L, C)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        if self.norm is not None:
            x = self.norm(x)
        return x


class PatchUnEmbed(nnx.Module):
    """Tokens -> image (reference: swinir.py:674-702)."""

    def __call__(self, x, x_size):
        b, _, c = x.shape
        return x.reshape(b, x_size[0], x_size[1], c)


class BasicLayer(nnx.Module):
    """A stage of Swin blocks (reference: swinir.py:391-454 lower half)."""

    def __init__(self, dim, input_resolution, depth, num_heads, window_size, mlp_ratio,
                 qkv_bias, qk_scale, drop, attn_drop, drop_path, use_checkpoint, *, rngs, dtype=None):
        self.use_checkpoint = use_checkpoint
        self.blocks = nnx.List([
            SwinTransformerBlock(
                dim,
                input_resolution,
                num_heads,
                window_size,
                0 if (i % 2 == 0) else window_size // 2,
                mlp_ratio,
                qkv_bias,
                qk_scale,
                drop,
                attn_drop,
                drop_path[i] if isinstance(drop_path, (list, tuple)) else drop_path,
                rngs=rngs,
                dtype=dtype,
            )
            for i in range(depth)
        ])

    def _fused_chain_ok(self, b, h, w, c):
        """True when every block can run the whole-block fused kernel and
        the roll-space chain is well-formed (uniform even window, shifts in
        {0, ws/2}, eval mode, no active dropout).  Training takes the fused
        TRAIN chain instead when :meth:`_fused_train_ok` holds (fused
        forward + whole-block VJP kernels); otherwise the reference XLA
        blocks."""
        from ..ops.pallas import swinblock

        if not all(blk.attn.deterministic for blk in self.blocks):
            return False
        sizes = {blk.window_size for blk in self.blocks}
        if len(sizes) != 1:
            return False
        ws = sizes.pop()
        def inactive(drop):
            return drop is None or getattr(drop, "deterministic", False)

        for blk in self.blocks:
            if blk.shift_size not in (0, ws // 2):
                return False
            if not (inactive(blk.attn.attn_drop) and inactive(blk.attn.proj_drop)):
                return False
            if not (inactive(blk.mlp.drop) and inactive(blk.drop_path.drop)):
                return False
        return swinblock.eligible(b, h, w, c, self.blocks[0].num_heads, ws)

    def _fused_train_ok(self, b, h, w, c):
        """True when every block can run the fused TRAIN chain (forward +
        whole-block VJP kernels): train mode with all elementwise dropouts
        inactive — stochastic depth is allowed (carried as per-sample
        keep-scales into the kernels).  Reference semantics preserved:
        swinir.py:270-389 with drop/attn_drop = 0 (the PSSR2 default)."""
        from ..ops.pallas import swinblock

        sizes = {blk.window_size for blk in self.blocks}
        if len(sizes) != 1:
            return False
        ws = sizes.pop()

        def inactive(drop):
            return drop is None or getattr(drop, "deterministic", False)

        for blk in self.blocks:
            if blk.shift_size not in (0, ws // 2):
                return False
            if not (inactive(blk.attn.attn_drop) and inactive(blk.attn.proj_drop)):
                return False
            if not inactive(blk.mlp.drop):
                return False
        return swinblock.eligible_train(b, h, w, c, self.blocks[0].num_heads, ws)

    def _rolled_chain(self, x, b, h, w, c, train):
        """Whole-block fused chain in roll space: one kernel pass per
        block, one XLA roll per layer (ops/pallas/swinblock).  The train
        variant uses the fused VJP kernels — which already recompute in
        their backward, so use_checkpoint adds nothing there."""
        x_img = x.reshape(b, h, w, c)
        v = 0
        for block in self.blocks:
            if train:
                s1, s2 = block.drop_path_scales(b)
                x_img, v = block.forward_rolled_train(x_img, v, s1, s2)
            elif self.use_checkpoint:
                x_img = jax.checkpoint(
                    lambda t, blk=block, vi=v: blk.forward_rolled(t, vi)[0]
                )(x_img)
                v = block.shift_size
            else:
                x_img, v = block.forward_rolled(x_img, v)
        if v:
            x_img = jnp.roll(x_img, (v, v), axis=(1, 2))
        return x_img.reshape(b, h * w, c)

    def __call__(self, x, x_size):
        h, w = x_size
        b, _, c = x.shape
        if self._fused_chain_ok(b, h, w, c):
            return self._rolled_chain(x, b, h, w, c, train=False)
        if not all(blk.attn.deterministic for blk in self.blocks) and self._fused_train_ok(
            b, h, w, c
        ):
            return self._rolled_chain(x, b, h, w, c, train=True)
        for block in self.blocks:
            if self.use_checkpoint:
                x = jax.checkpoint(lambda x_, blk=block: blk(x_, x_size))(x)
            else:
                x = block(x, x_size)
        return x


class RSTB(nnx.Module):
    """Residual Swin Transformer Block group (reference: swinir.py:391-454)."""

    def __init__(self, dim, input_resolution, depth, num_heads, window_size, mlp_ratio,
                 qkv_bias, qk_scale, drop, attn_drop, drop_path, use_checkpoint,
                 resi_connection="1conv", *, rngs, dtype=None):
        self.residual_group = BasicLayer(
            dim, input_resolution, depth, num_heads, window_size, mlp_ratio,
            qkv_bias, qk_scale, drop, attn_drop, drop_path, use_checkpoint,
            rngs=rngs, dtype=dtype,
        )
        if resi_connection == "1conv":
            self.convs = nnx.List([_torch_conv(dim, dim, 3, rngs=rngs, dtype=dtype)])
            self.conv_mode = "1conv"
        elif resi_connection == "3conv":
            self.convs = nnx.List([
                _torch_conv(dim, dim // 4, 3, rngs=rngs, dtype=dtype),
                _torch_conv(dim // 4, dim // 4, 1, rngs=rngs, dtype=dtype),
                _torch_conv(dim // 4, dim, 3, rngs=rngs, dtype=dtype),
            ])
            self.conv_mode = "3conv"
        else:
            raise ValueError(f"Unknown resi_connection {resi_connection}")
        self.patch_unembed = PatchUnEmbed()
        self.patch_embed = PatchEmbed(dim, norm_layer=False, rngs=rngs, dtype=dtype)

    def __call__(self, x, x_size):
        res = self.residual_group(x, x_size)
        img = self.patch_unembed(res, x_size)
        if self.conv_mode == "1conv":
            img = self.convs[0](img)
        else:
            img = self.convs[0](img)
            img = jax.nn.leaky_relu(img, 0.2)
            img = self.convs[1](img)
            img = jax.nn.leaky_relu(img, 0.2)
            img = self.convs[2](img)
        return self.patch_embed(img) + x


class SwinIR(nnx.Module):
    def __init__(
        self,
        image_size: int = 128,
        channels: list[int] = 1,
        scale: int = 4,
        embed_dim: int = 96,
        mlp_ratio: int = 2,
        depths: list[int] = None,
        num_heads: list[int] = None,
        window_size: int = 8,
        patch_size: int = 1,
        upsampler: str = "pixelshuffle",
        qkv_bias: bool = True,
        qk_scale: float = None,
        drop_rate: float = 0,
        attn_drop_rate: float = 0,
        drop_path_rate: float = 0.1,
        ape: bool = False,
        patch_norm: bool = True,
        use_checkpoint: bool = False,
        resi_connection: str = "1conv",
        *,
        dtype=None,
        rngs: nnx.Rngs = None,
    ):
        """SwinIR as detailed in Liang et al., 2021 — same argument surface
        as the reference (swinir.py:16-124); see there for arg docs.
        ``patch_size`` must be 1 (the only configuration the reference
        exercises; its PatchEmbed never actually patchifies).
        """
        rngs = nnx.Rngs(0) if rngs is None else rngs
        from .blocks import resolve_dtype

        dtype = resolve_dtype(dtype)
        depths = [4, 4, 4, 4] if depths is None else depths
        num_heads = [6, 6, 6, 6] if num_heads is None else num_heads
        if len(depths) != len(num_heads):
            raise ValueError(
                f"Lengths of depths and num_heads must be equal. Given lengths are "
                f"{len(depths)} and {len(num_heads)}."
            )
        if patch_size != 1:
            raise ValueError("patch_size must be 1 (matching the reference's effective behavior).")

        channels = force_list(channels)
        channels = channels * 2 if len(channels) == 1 else channels
        num_in_ch, num_out_ch = channels[0], channels[1]
        num_feat = 64
        self.img_range = 1.0
        self.upscale = scale
        self.upsampler = upsampler
        self.window_size = window_size
        self.num_layers = len(depths)
        self.embed_dim = embed_dim
        self.num_features = embed_dim
        self.ape = ape
        self.mlp_ratio = mlp_ratio
        self.channels = channels
        self.dtype = dtype

        patches_resolution = (image_size, image_size)
        self.patches_resolution = patches_resolution

        self.conv_first = _torch_conv(num_in_ch, embed_dim, 3, rngs=rngs, dtype=dtype)

        self.patch_embed = PatchEmbed(embed_dim, norm_layer=patch_norm, rngs=rngs, dtype=dtype)
        self.patch_unembed = PatchUnEmbed()

        if ape:
            num_patches = patches_resolution[0] * patches_resolution[1]
            self.absolute_pos_embed = nnx.Param(
                trunc_normal_init(rngs.params(), (1, num_patches, embed_dim), jnp.float32)
            )
        else:
            self.absolute_pos_embed = None
        self.pos_drop = nnx.Dropout(drop_rate, rngs=rngs) if drop_rate > 0 else None

        dpr = np.linspace(0, drop_path_rate, sum(depths)).tolist()
        self.layers = nnx.List([])
        for i_layer in range(self.num_layers):
            self.layers.append(
                RSTB(
                    embed_dim,
                    patches_resolution,
                    depths[i_layer],
                    num_heads[i_layer],
                    window_size,
                    mlp_ratio,
                    qkv_bias,
                    qk_scale,
                    drop_rate,
                    attn_drop_rate,
                    dpr[sum(depths[:i_layer]) : sum(depths[: i_layer + 1])],
                    use_checkpoint,
                    resi_connection,
                    rngs=rngs,
                    dtype=dtype,
                )
            )
        self.norm = nnx.LayerNorm(self.num_features, dtype=dtype, rngs=rngs)

        if resi_connection == "1conv":
            self.conv_after_body = nnx.List([_torch_conv(embed_dim, embed_dim, 3, rngs=rngs, dtype=dtype)])
        else:
            self.conv_after_body = nnx.List([
                _torch_conv(embed_dim, embed_dim // 4, 3, rngs=rngs, dtype=dtype),
                _torch_conv(embed_dim // 4, embed_dim // 4, 1, rngs=rngs, dtype=dtype),
                _torch_conv(embed_dim // 4, embed_dim, 3, rngs=rngs, dtype=dtype),
            ])
        self.resi_connection = resi_connection

        if upsampler == "pixelshuffle":
            self.conv_before_upsample = _torch_conv(embed_dim, num_feat, 3, rngs=rngs, dtype=dtype)
            ups = nnx.List([])
            if (scale & (scale - 1)) == 0:  # power of two
                for _ in range(int(np.log2(scale))):
                    ups.append(_torch_conv(num_feat, 4 * num_feat, 3, rngs=rngs, dtype=dtype))
            elif scale == 3:
                ups.append(_torch_conv(num_feat, 9 * num_feat, 3, rngs=rngs, dtype=dtype))
            else:
                raise ValueError(f"scale {scale} is not supported. Supported scales: 2^n and 3.")
            self.upsample = ups
            self.conv_last = _torch_conv(num_feat, num_out_ch, 3, rngs=rngs, dtype=dtype)
        elif upsampler == "pixelshuffledirect":
            self.upsample_direct = _torch_conv(embed_dim, scale**2 * num_out_ch, 3, rngs=rngs, dtype=dtype)
        elif upsampler == "nearest+conv":
            self.conv_before_upsample = _torch_conv(embed_dim, num_feat, 3, rngs=rngs, dtype=dtype)
            self.conv_up1 = _torch_conv(num_feat, num_feat, 3, rngs=rngs, dtype=dtype)
            self.conv_up2 = _torch_conv(num_feat, num_feat, 3, rngs=rngs, dtype=dtype) if scale == 4 else None
            self.conv_hr = _torch_conv(num_feat, num_feat, 3, rngs=rngs, dtype=dtype)
            self.conv_last = _torch_conv(num_feat, num_out_ch, 3, rngs=rngs, dtype=dtype)
        else:
            self.conv_last = _torch_conv(embed_dim, num_out_ch, 3, rngs=rngs, dtype=dtype)

    def _check_image_size(self, x):
        # NHWC reflect pad to a window multiple (reference: swinir.py:208-213)
        h, w = x.shape[1], x.shape[2]
        mod_h = (self.window_size - h % self.window_size) % self.window_size
        mod_w = (self.window_size - w % self.window_size) % self.window_size
        if mod_h or mod_w:
            x = jnp.pad(x, ((0, 0), (0, mod_h), (0, mod_w), (0, 0)), mode="reflect")
        return x

    def _forward_features(self, x):
        x_size = (x.shape[1], x.shape[2])
        x = self.patch_embed(x)
        if self.absolute_pos_embed is not None:
            x = x + self.absolute_pos_embed.value.astype(x.dtype)
        if self.pos_drop is not None:
            x = self.pos_drop(x)
        for layer in self.layers:
            x = layer(x, x_size)
        x = self.norm(x)
        return self.patch_unembed(x, x_size)

    def _after_body(self, x):
        if self.resi_connection == "1conv":
            return self.conv_after_body[0](x)
        x = jax.nn.leaky_relu(self.conv_after_body[0](x), 0.2)
        x = jax.nn.leaky_relu(self.conv_after_body[1](x), 0.2)
        return self.conv_after_body[2](x)

    def __call__(self, x):
        # NCHW [0,255] in -> NCHW out; SwinIR runs on raw values
        # (img_range=1, mean=0 for grayscale; reference: swinir.py:96-101)
        h_in, w_in = x.shape[2], x.shape[3]
        x = jnp.transpose(x, (0, 2, 3, 1))  # -> NHWC
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = self._check_image_size(x)

        if self.upsampler == "pixelshuffle":
            x = self.conv_first(x)
            x = self._after_body(self._forward_features(x)) + x
            x = jax.nn.leaky_relu(self.conv_before_upsample(x), 0.01)
            s_up = 2 if (self.upscale & (self.upscale - 1)) == 0 else 3
            for up_conv in self.upsample[:-1]:
                x = pixel_shuffle(up_conv(x), s_up, channels_last=True)
            if self.conv_last.kernel.shape[-1] <= 8:
                # final shuffle + small-C_out conv fused (the naive form
                # runs at 0.4% MXU; see ops/smallconv.py)
                from ..ops.smallconv import fused_upsample_tail

                x = fused_upsample_tail(x, self.upsample[-1], self.conv_last, s_up)
            else:
                x = pixel_shuffle(self.upsample[-1](x), s_up, channels_last=True)
                x = self.conv_last(x)
        elif self.upsampler == "pixelshuffledirect":
            x = self.conv_first(x)
            x = self._after_body(self._forward_features(x)) + x
            x = pixel_shuffle(self.upsample_direct(x), self.upscale, channels_last=True)
        elif self.upsampler == "nearest+conv":
            x = self.conv_first(x)
            x = self._after_body(self._forward_features(x)) + x
            x = jax.nn.leaky_relu(self.conv_before_upsample(x), 0.01)
            x = jax.nn.leaky_relu(
                self.conv_up1(jax.image.resize(x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]), "nearest")),
                0.2,
            )
            if self.conv_up2 is not None:
                x = jax.nn.leaky_relu(
                    self.conv_up2(jax.image.resize(x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]), "nearest")),
                    0.2,
                )
            x = self.conv_last(jax.nn.leaky_relu(self.conv_hr(x), 0.2))
        else:
            x_first = self.conv_first(x)
            res = self._after_body(self._forward_features(x_first)) + x_first
            x = x + self.conv_last(res)

        x = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)  # -> NCHW
        return x[:, :, : h_in * self.upscale, : w_in * self.upscale]

    def extra_repr(self):
        return (
            f"SwinIR with {self.upscale}x upscaling\n"
            f"{self.num_layers} Swin Transformer blocks with embedding size {self.embed_dim}"
        )

    def __str__(self):
        return f"SwinIR(\n{self.extra_repr()}\n)"
