"""Fused ResBlock conv-layer kernel (ops/pallas/convchain) parity tests —
interpret mode on CPU against the XLA reference layer (reference
semantics: pssr/models/_blocks.py:20-41 conv->BN->ReLU chain with this
repo's FastBatchNorm apply and sg_bias)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pssr2_tpu.ops.pallas import convchain

N, H, W, CIN, COUT = 2, 10, 128, 16, 8


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = convchain.MODE
    convchain.MODE = "interpret"
    yield
    convchain.MODE = old


def _inputs(seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (N, H, CIN, W)), dtype)
    kernel = jnp.asarray(rng.normal(0, 0.1, (3, 3, CIN, COUT)), dtype)
    bias = jnp.asarray(rng.normal(0, 0.1, (COUT,)), jnp.float32)
    ab = jnp.asarray(np.stack([rng.uniform(0.5, 1.5, CIN), rng.normal(0, 0.3, CIN)]), jnp.float32)
    return x, convchain.kernel_matrix(kernel), bias, ab


@pytest.mark.parametrize("relu_in", [True, False])
def test_fwd_matches_reference_f32(relu_in):
    x, wmat, bias, ab = _inputs(0)
    args = (x, wmat, bias, ab if relu_in else None)
    yk, s1k, s2k = convchain.fused_conv_layer(*args, relu_in=relu_in)
    yr, s1r, s2r = convchain.reference_layer(*args, relu_in=relu_in)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=1e-5)
    # stats are f32 sums over ~20k elements; reduction-order noise only
    np.testing.assert_allclose(np.asarray(s1k), np.asarray(s1r), atol=2e-2)
    np.testing.assert_allclose(np.asarray(s2k), np.asarray(s2r), atol=2e-1)


def test_fwd_matches_reference_bf16():
    x, wmat, bias, ab = _inputs(1, jnp.bfloat16)
    yk, s1k, s2k = convchain.fused_conv_layer(x, wmat, bias, ab)
    yr, s1r, s2r = convchain.reference_layer(x, wmat, bias, ab)
    np.testing.assert_allclose(
        np.asarray(yk, np.float32), np.asarray(yr, np.float32), atol=3e-2
    )


def test_border_handling_exact():
    """Zero-padding semantics at all four edges: compare against a
    numpy direct convolution on a tiny case."""
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 5, 4, 128)).astype(np.float32)  # (N,H,C,W)
    k = rng.normal(0, 0.3, (3, 3, 4, 3)).astype(np.float32)  # HWIO
    y_np = np.zeros((1, 5, 3, 128), np.float32)
    xp = np.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)))
    for hh in range(5):
        for ww in range(128):
            patch = xp[0, hh : hh + 3, :, ww : ww + 3]  # (ky, C, kx)
            y_np[0, hh, :, ww] = np.tensordot(
                patch.transpose(0, 2, 1), k, axes=([0, 1, 2], [0, 1, 2])
            )
    yk, _, _ = convchain.fused_conv_layer(
        jnp.asarray(x), convchain.kernel_matrix(jnp.asarray(k)), jnp.zeros((3,)), relu_in=False
    )
    np.testing.assert_allclose(np.asarray(yk), y_np, atol=1e-4)


@pytest.mark.parametrize("relu_in", [True, False])
def test_vjp_matches_reference_f32(relu_in):
    """Full VJP parity (dx, dW, dbias, d_ab) against jax.vjp of the XLA
    reference layer, with nonzero cotangents on y AND both stat outputs
    (the stat-folded g = gy + gs1 + 2y*gs2 path)."""
    x, wmat, bias, ab = _inputs(3)
    rng = np.random.default_rng(7)
    gy = jnp.asarray(rng.normal(0, 1, (N, H, COUT, W)), jnp.float32)
    gs1 = jnp.asarray(rng.normal(0, 0.1, (COUT,)), jnp.float32)
    gs2 = jnp.asarray(rng.normal(0, 0.05, (COUT,)), jnp.float32)
    cts = (gy, gs1, gs2)

    args = (x, wmat, bias, ab)

    def k_fn(x_, w_, b_, ab_):
        return convchain.fused_conv_layer(x_, w_, b_, ab_, relu_in=relu_in)

    def r_fn(x_, w_, b_, ab_):
        return convchain.reference_layer(x_, w_, b_, ab_ if relu_in else None, relu_in=relu_in)

    outk, vjpk = jax.vjp(k_fn, *args)
    outr, vjpr = jax.vjp(r_fn, *args)
    np.testing.assert_allclose(np.asarray(outk[0]), np.asarray(outr[0]), atol=1e-5)
    gk = vjpk(cts)
    gr = vjpr(cts)
    names = ["dx", "dwmat", "dbias", "dab"]
    for name, a, b in zip(names, gk, gr):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=5e-4 * scale, err_msg=name)
    if not relu_in:
        assert float(np.abs(np.asarray(gk[3])).max()) == 0.0


def test_transpose_boundary_flags_match_explicit_transposes():
    """transpose_in/out (VMEM-side layout change at the chain
    boundaries) must equal the NHCW kernel wrapped in explicit
    transposes — values AND the full VJP."""
    x, wmat, bias, ab = _inputs(8)
    x_nhwc = jnp.transpose(x, (0, 1, 3, 2))  # (N, H, W, CIN)

    def flagged(x_, w_, b_, ab_):
        y, s1, s2 = convchain.fused_conv_layer(
            x_, w_, b_, ab_, relu_in=True, transpose_in=True, transpose_out=True
        )
        return jnp.sum(y * jnp.sin(y)) + jnp.sum(s1 * s2)

    def explicit(x_, w_, b_, ab_):
        y, s1, s2 = convchain.fused_conv_layer(
            jnp.transpose(x_, (0, 1, 3, 2)), w_, b_, ab_, relu_in=True
        )
        y = jnp.transpose(y, (0, 1, 3, 2))
        return jnp.sum(y * jnp.sin(y)) + jnp.sum(s1 * s2)

    lf, gf = jax.value_and_grad(flagged, argnums=(0, 1, 2, 3))(x_nhwc, wmat, bias, ab)
    le, ge = jax.value_and_grad(explicit, argnums=(0, 1, 2, 3))(x_nhwc, wmat, bias, ab)
    np.testing.assert_allclose(float(lf), float(le), rtol=1e-6)
    for name, a, b in zip(["dx", "dw", "dbias", "dab"], gf, ge):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # f32-reordering class only: XLA fuses the external transposes
        # differently, so bit-identity is not expected
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=1e-6 * scale, err_msg=name)


def test_vjp_chain_two_layers_f32():
    """Two chained fused layers with BN-coefficient glue between them:
    grads through the full chain (incl. stat cotangents feeding layer 0)
    match the XLA twin chain."""
    x, wmat, bias, _ = _inputs(4)
    rng = np.random.default_rng(11)
    wmat2 = convchain.kernel_matrix(
        jnp.asarray(rng.normal(0, 0.1, (3, 3, COUT, COUT)), jnp.float32)
    )
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, COUT), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.2, COUT), jnp.float32)
    count = N * H * W

    def chain(layer_fn, x_, w1, w2, g_, b_):
        y0, s1, s2 = layer_fn(x_, w1, bias, None, False)
        mean = s1 / count
        var = s2 / count - mean * mean
        a = g_ * jax.lax.rsqrt(var + 1e-5)
        b = b_ - mean * a
        ab = jnp.stack([a, b])
        y1, t1, t2 = layer_fn(y0, w2, bias, ab, True)
        return jnp.sum(y1 * y1) + jnp.sum(t2) + jnp.sum(t1 * t1)

    def k_layer(x_, w_, b_, ab_, relu_in):
        return convchain.fused_conv_layer(x_, w_, b_, ab_, relu_in=relu_in)

    def r_layer(x_, w_, b_, ab_, relu_in):
        return convchain.reference_layer(x_, w_, b_, ab_, relu_in=relu_in)

    gk = jax.grad(lambda *a: chain(k_layer, *a), argnums=(0, 1, 2, 3, 4))(
        x, wmat, wmat2, gamma, beta
    )
    gr = jax.grad(lambda *a: chain(r_layer, *a), argnums=(0, 1, 2, 3, 4))(
        x, wmat, wmat2, gamma, beta
    )
    for name, a, b in zip(["dx", "dw1", "dw2", "dgamma", "dbeta"], gk, gr):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=1e-3 * scale, err_msg=name)


class TestResBlockIntegration:
    """ResBlock._convchain_call vs the standard XLA path: same module,
    same input, outputs/grads/running-stats equal (interpret mode).
    ``impl`` picks the kernel: "chain" (W=128, convchain) or "nhwc"
    (W=20, convnhwc) — the two fused paths share the apply_coeffs glue."""

    impl = "chain"

    def _mod(self):
        if self.impl == "chain":
            return convchain
        from pssr2_tpu.ops.pallas import convnhwc

        return convnhwc

    def _block(self, cin, depth=2, norm=True, seed=0):
        from flax import nnx

        from pssr2_tpu.models.blocks import ResBlock

        # nhwc eligibility needs cout>=64 (deep-stage gate)
        cout = 8 if self.impl == "chain" else 64
        return ResBlock(cin, cout, depth, norm=norm, rngs=nnx.Rngs(seed))

    def _x(self, cin, seed=0):
        rng = np.random.default_rng(seed)
        w = 128 if self.impl == "chain" else 20
        return jnp.asarray(rng.normal(0, 1, (2, 6, w, cin)), jnp.float32)

    def _run(self, block, x, mode, train=True):
        from flax import nnx

        block.train() if train else block.eval()
        mod = self._mod()
        old = mod.MODE
        mod.MODE = mode
        try:
            if mode == "interpret":
                split = block._convchain_split(x)
                assert split is not None and split[1] == self.impl
            graphdef, state = nnx.split(block)
            m = nnx.merge(graphdef, state)  # fresh copy: isolate stat updates

            def fwd(m_, x_):
                return m_(x_)

            out = fwd(m, x)
            return out, nnx.state(m)
        finally:
            mod.MODE = old

    # 12 -> layer 0 ineligible (XLA prefix path); 4 -> chain takes it via
    # the sublane zero-pad entry, nhwc leaves it to the prefix
    @pytest.mark.parametrize("cin", [16, 4, 12])
    def test_forward_and_stats_match(self, cin):
        block = self._block(cin)
        x = self._x(cin)
        y_f, st_f = self._run(block, x, "interpret")
        y_r, st_r = self._run(block, x, "off")
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), atol=2e-4)
        flat_f = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(st_f)}
        flat_r = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(st_r)}
        assert flat_f.keys() == flat_r.keys()
        for k in flat_f:
            np.testing.assert_allclose(
                np.asarray(flat_f[k]), np.asarray(flat_r[k]), atol=1e-4, err_msg=k
            )

    def test_eval_forward_matches(self):
        block = self._block(16)
        # non-trivial running stats
        nf = block.norms[0].mean[...].shape[0]
        block.norms[0].mean[...] = jnp.linspace(-0.5, 0.5, nf)
        block.norms[0].var[...] = jnp.linspace(0.5, 1.5, nf)
        x = self._x(16)
        y_f, _ = self._run(block, x, "interpret", train=False)
        y_r, _ = self._run(block, x, "off", train=False)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), atol=2e-4)

    @pytest.mark.parametrize("cin", [16, 4, 12])
    def test_grads_match(self, cin):
        from flax import nnx

        block = self._block(cin)
        x = self._x(cin)

        mod = self._mod()

        def grads(mode):
            old = mod.MODE
            mod.MODE = mode
            try:
                graphdef, state = nnx.split(block)

                def loss_fn(params, x_):
                    m = nnx.merge(graphdef, params)
                    m.train()
                    y = m(x_)
                    return jnp.sum(y * jnp.sin(y))

                g_params, g_x = jax.grad(loss_fn, argnums=(0, 1))(state, x)
                return g_params, g_x
            finally:
                mod.MODE = old

        gp_f, gx_f = grads("interpret")
        gp_r, gx_r = grads("off")
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=5e-4)
        leaves_f = jax.tree_util.tree_leaves_with_path(gp_f)
        leaves_r = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(gp_r)}
        assert len(leaves_f) == len(leaves_r)
        for k, v in leaves_f:
            ref = leaves_r[str(k)]
            scale = max(float(np.abs(np.asarray(ref)).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(ref), atol=1e-3 * scale, err_msg=str(k)
            )

    def test_norm_free_block_matches(self):
        block = self._block(16, norm=False)
        x = self._x(16)
        y_f, _ = self._run(block, x, "interpret")
        y_r, _ = self._run(block, x, "off")
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), atol=2e-4)

    def test_hbm_transpose_variant_matches(self):
        """VMEM_TRANSPOSE=False (probe50 isolation flag): the explicit
        XLA HBM-transpose chain boundaries give the same outputs/stats."""
        if self.impl != "chain":
            pytest.skip("chain-boundary flag only")
        block = self._block(16)
        x = self._x(16)
        y_r, st_r = self._run(block, x, "off")
        old = convchain.VMEM_TRANSPOSE
        convchain.VMEM_TRANSPOSE = False
        try:
            y_f, st_f = self._run(block, x, "interpret")
        finally:
            convchain.VMEM_TRANSPOSE = old
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), atol=2e-4)
        flat_f = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(st_f)}
        flat_r = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(st_r)}
        for k in flat_f:
            np.testing.assert_allclose(
                np.asarray(flat_f[k]), np.asarray(flat_r[k]), atol=1e-4, err_msg=k
            )

    def test_pad_entry_disabled_splits_later_and_matches(self):
        """PAD_ENTRY=False (probe50 isolation flag): the cin<8 entry layer
        drops back to the XLA prefix; the chain still takes the suffix."""
        if self.impl != "chain":
            pytest.skip("chain entry-pad flag only")
        block = self._block(4)
        x = self._x(4)
        y_r, _ = self._run(block, x, "off")
        old = convchain.PAD_ENTRY
        convchain.PAD_ENTRY = False
        try:
            old_mode = convchain.MODE
            convchain.MODE = "interpret"
            try:
                assert block._convchain_split(x) == (1, "chain")
            finally:
                convchain.MODE = old_mode
            y_f, _ = self._run(block, x, "interpret")
        finally:
            convchain.PAD_ENTRY = old
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), atol=2e-4)


class TestResBlockIntegrationNHWC(TestResBlockIntegration):
    """Same suite through the deep-stage NHWC tap-dot kernel
    (ops/pallas/convnhwc) — W=20 makes convchain ineligible so the split
    must pick impl 'nhwc'."""

    impl = "nhwc"


def test_shard_map_sync_bn_matches_single_program():
    """Fused ResBlock chain inside shard_map DP with sync-BN: the
    apply_coeffs psum glue (batch statistics + count over the mapped
    axis) must reproduce the single-program full-batch run — outputs,
    running stats, and pmean'd parameter grads (the train step's
    contract, train.py:_build_shard_map_steps)."""
    import jax
    from flax import nnx
    from jax.sharding import Mesh, PartitionSpec as P

    from pssr2_tpu.models.blocks import ResBlock
    from pssr2_tpu.ops import batchnorm as bn

    old = convchain.MODE
    convchain.MODE = "interpret"
    try:
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 1, (8, 4, 128, 16)), jnp.float32)
        block = ResBlock(16, 8, 1, rngs=nnx.Rngs(3))
        block.train()
        graphdef, state = nnx.split(block)

        def loss_fn(state_, x_):
            m = nnx.merge(graphdef, state_)
            y = m(x_)
            out = jnp.sum(y * jnp.cos(y))
            return out, nnx.state(m)

        (ref_l, ref_state), ref_g = jax.value_and_grad(loss_fn, has_aux=True)(state, x)

        mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))

        def local(state_, x_):
            with bn.sync_axis("data"):
                (l, new_state), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state_, x_
                )
            return jax.lax.psum(l, "data"), new_state, jax.lax.psum(g, "data")

        sm = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), P("data")),
                out_specs=(P(), P(), P()),
                check_vma=False,  # pallas_call inside (the production
                # dp_shard_map steps do the same — train.py:217)
            )
        )
        l, new_state, g = sm(state, x)
        np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-5)
        for (pk, pv), (rk, rv) in zip(
            jax.tree_util.tree_leaves_with_path(new_state),
            jax.tree_util.tree_leaves_with_path(ref_state),
        ):
            np.testing.assert_allclose(
                np.asarray(pv), np.asarray(rv), atol=1e-5, err_msg=str(pk)
            )
        for (pk, pv), (rk, rv) in zip(
            jax.tree_util.tree_leaves_with_path(g),
            jax.tree_util.tree_leaves_with_path(ref_g),
        ):
            scale = max(float(np.abs(np.asarray(rv)).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(pv), np.asarray(rv), atol=2e-5 * scale, err_msg=str(pk)
            )
    finally:
        convchain.MODE = old


def test_eligibility_gates():
    assert convchain.eligible(16, 128, 128, 64, 64, jnp.float32, train=True)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(convchain, "MODE", "off")
        assert not convchain.eligible(16, 128, 128, 64, 64, jnp.float32, train=True)
        mp.setattr(convchain, "MODE", "auto")
        # off-TPU (CPU backend) never takes the compiled kernel
        assert not convchain.eligible(16, 128, 128, 64, 64, jnp.bfloat16, train=True)
    # lane-exact width and sublane-tile channels required
    assert not convchain.eligible(16, 128, 100, 64, 64, jnp.float32, train=True)
    assert not convchain.eligible(16, 128, 128, 63, 64, jnp.float32, train=True)
    from pssr2_tpu.ops.pallas.guard import mesh_scope

    with mesh_scope():
        assert not convchain.eligible(16, 128, 128, 64, 64, jnp.float32, train=True)


def _pack_nhcw(x, p):
    """(N, H, C, W) -> (N, H/p, C, p*W): p consecutive image rows side by
    side on the lanes (the convchain.PACK layout)."""
    n, h, c, w = x.shape
    return x.reshape(n, h // p, p, c, w).transpose(0, 1, 3, 2, 4).reshape(n, h // p, c, p * w)


def _unpack_nhcw(y, p):
    n, hp, c, l = y.shape
    w = l // p
    return y.reshape(n, hp, c, p, w).transpose(0, 1, 3, 2, 4).reshape(n, hp * p, c, w)


class TestPacked:
    """convchain.PACK: W<128 stages with 128/W rows packed on the lanes.
    The packed kernel must equal the unpacked reference layer exactly at
    the row seams (ky taps crossing packed-row boundaries) and the image
    edges (seam masks)."""

    @pytest.mark.parametrize("h,w", [(10, 64), (8, 32), (8, 16)])
    @pytest.mark.parametrize("relu_in", [True, False])
    def test_fwd_matches_reference(self, h, w, relu_in):
        p = 128 // w
        rng = np.random.default_rng(h * w)
        cin, cout = 16, 8
        x = jnp.asarray(rng.normal(0, 1, (2, h, cin, w)), jnp.float32)
        kernel = jnp.asarray(rng.normal(0, 0.1, (3, 3, cin, cout)), jnp.float32)
        wmat = convchain.kernel_matrix(kernel)
        bias = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)
        ab = jnp.asarray(
            np.stack([rng.uniform(0.5, 1.5, cin), rng.normal(0, 0.3, cin)]), jnp.float32
        )
        abk = ab if relu_in else None
        yk, s1k, s2k = convchain.fused_conv_layer(
            _pack_nhcw(x, p), wmat, bias, abk, relu_in=relu_in, pack=p
        )
        yr, s1r, s2r = convchain.reference_layer(x, wmat, bias, abk, relu_in=relu_in)
        np.testing.assert_allclose(
            np.asarray(_unpack_nhcw(yk, p)), np.asarray(yr), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(s1k), np.asarray(s1r), atol=2e-2)
        np.testing.assert_allclose(np.asarray(s2k), np.asarray(s2r), atol=2e-1)

    @pytest.mark.parametrize("h,w", [(10, 64), (8, 32)])
    def test_vjp_matches_reference(self, h, w):
        p = 128 // w
        rng = np.random.default_rng(h + w)
        cin, cout = 16, 8
        x = jnp.asarray(rng.normal(0, 1, (2, h, cin, w)), jnp.float32)
        kernel = jnp.asarray(rng.normal(0, 0.1, (3, 3, cin, cout)), jnp.float32)
        wmat = convchain.kernel_matrix(kernel)
        bias = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)
        ab = jnp.asarray(
            np.stack([rng.uniform(0.5, 1.5, cin), rng.normal(0, 0.3, cin)]), jnp.float32
        )
        gy = jnp.asarray(rng.normal(0, 1, (2, h, cout, w)), jnp.float32)
        gs1 = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)
        gs2 = jnp.asarray(rng.normal(0, 0.05, (cout,)), jnp.float32)

        def k_fn(x_, w_, b_, ab_):
            y, s1, s2 = convchain.fused_conv_layer(
                _pack_nhcw(x_, p), w_, b_, ab_, relu_in=True, pack=p
            )
            return _unpack_nhcw(y, p), s1, s2

        def r_fn(x_, w_, b_, ab_):
            return convchain.reference_layer(x_, w_, b_, ab_, relu_in=True)

        args = (x, wmat, bias, ab)
        outk, vjpk = jax.vjp(k_fn, *args)
        outr, vjpr = jax.vjp(r_fn, *args)
        np.testing.assert_allclose(np.asarray(outk[0]), np.asarray(outr[0]), atol=1e-5)
        gk = vjpk((gy, gs1, gs2))
        gr = vjpr((gy, gs1, gs2))
        for name, a, b in zip(["dx", "dwmat", "dbias", "dab"], gk, gr):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            scale = max(np.abs(b).max(), 1e-6)
            np.testing.assert_allclose(a, b, atol=5e-4 * scale, err_msg=name)

    def test_packed_border_exact(self):
        """Zero-padding semantics with packing: numpy direct conv oracle
        on a W=32/P=4 case (exercises all 3 interior lane seams AND the
        packed-row carries)."""
        p, h, w, cin, cout = 4, 8, 32, 8, 8
        rng = np.random.default_rng(5)
        x = rng.normal(0, 1, (1, h, cin, w)).astype(np.float32)
        k = rng.normal(0, 0.3, (3, 3, cin, cout)).astype(np.float32)
        y_np = np.zeros((1, h, cout, w), np.float32)
        xp = np.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)))
        for hh in range(h):
            for ww in range(w):
                patch = xp[0, hh : hh + 3, :, ww : ww + 3]  # (ky, C, kx)
                y_np[0, hh, :, ww] = np.tensordot(
                    patch.transpose(0, 2, 1), k, axes=([0, 1, 2], [0, 1, 2])
                )
        yk, _, _ = convchain.fused_conv_layer(
            _pack_nhcw(jnp.asarray(x), p),
            convchain.kernel_matrix(jnp.asarray(k)),
            jnp.zeros((cout,)),
            relu_in=False,
            pack=p,
        )
        np.testing.assert_allclose(np.asarray(_unpack_nhcw(yk, p)), y_np, atol=1e-4)


class TestResBlockIntegrationPacked(TestResBlockIntegration):
    """The full ResBlock chain on a W=32 (pack=4) stage.  PACK is
    default-OFF for training (probe51 composed refutation); force it on
    so the documented-negative-result path stays correct."""

    @pytest.fixture(autouse=True)
    def _pack_on(self):
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(convchain, "PACK", True)
            yield

    def _x(self, cin, seed=0):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.normal(0, 1, (2, 8, 32, cin)), jnp.float32)


def test_pack_factor():
    assert convchain.pack_factor(128, 128) == 1
    assert convchain.pack_factor(64, 64) == 2
    assert convchain.pack_factor(32, 32) == 4
    assert convchain.pack_factor(16, 16) == 8
    assert convchain.pack_factor(8, 8) == 0  # H % 16 != 0
    assert convchain.pack_factor(6, 32) == 0  # H % 4 != 0
    assert convchain.pack_factor(128, 100) == 0
    # default: PACK off for training (probe51 refutation)
    assert not convchain.eligible(16, 64, 64, 64, 64, jnp.float32, train=True)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(convchain, "PACK", True)
        assert convchain.eligible(16, 64, 64, 64, 64, jnp.float32, train=True)
