"""Fused RDNet block-tail kernel (ops/pallas/rdtail) parity tests —
interpret mode on CPU against the XLA reference tail and the unfused
model path (reference semantics: pssr/models/_rdnet.py:177-190)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from pssr2_tpu.models.rdnet import Block
from pssr2_tpu.ops.pallas import rdtail

M, C, INTER, G = 256, 48, 192, 24
EPS = 1e-6


def _params(rng):
    mk = lambda *s, sc=0.1: jnp.asarray(rng.standard_normal(s).astype(np.float32) * sc)
    return (
        mk(C, sc=0.5) + 1.0, mk(C),
        mk(C, INTER), mk(INTER),
        mk(INTER, G), mk(G),
    )


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = rdtail.MODE
    rdtail.MODE = "interpret"
    yield
    rdtail.MODE = old


def test_kernel_matches_reference_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32))
    params = _params(rng)
    out = rdtail.fused_rd_tail(x, *params, eps=EPS)
    ref = rdtail.reference_tail(x, *params, eps=EPS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_kernel_matches_reference_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((M, C)), jnp.bfloat16)
    params = _params(rng)
    out = np.asarray(rdtail.fused_rd_tail(x, *params, eps=EPS), np.float32)
    ref = np.asarray(rdtail.reference_tail(x.astype(jnp.bfloat16), *params, eps=EPS), np.float32)
    # identical formulation; a handful of elements land 1 bf16 ULP apart
    # from interpret-mode dot rounding order
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_custom_vjp_grads_match_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32))
    params = _params(rng)
    g = jnp.asarray(rng.standard_normal((M, G)).astype(np.float32))

    out, vjp = jax.vjp(lambda x_, *p: rdtail.fused_rd_tail(x_, *p, eps=EPS), x, *params)
    ref_out, ref_vjp = jax.vjp(
        lambda x_, *p: rdtail.reference_tail(x_, *p, eps=EPS), x, *params
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-6)
    grads = vjp(g)
    ref_grads = ref_vjp(g)
    names = ("dx", "dlns", "dlnb", "dw1", "db1", "dw2", "db2")
    for name, gr, rg in zip(names, grads, ref_grads):
        scale = max(1e-3, float(jnp.abs(rg).max()))
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(rg), atol=3e-5 * scale, err_msg=name
        )


def test_chunked_grid_accumulation_matches_single_step():
    """Param-grad accumulation across grid steps == one-chunk result."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32))
    params = _params(rng)
    g = jnp.asarray(rng.standard_normal((M, G)).astype(np.float32))

    def run():
        _, vjp = jax.vjp(lambda x_, *p: rdtail.fused_rd_tail(x_, *p, eps=EPS), x, *params)
        return vjp(g)

    old = rdtail.CHUNKS
    try:
        rdtail.CHUNKS = (M,)
        rdtail._tail_fn.cache_clear()
        single = run()
        rdtail.CHUNKS = (M // 4,)
        rdtail._tail_fn.cache_clear()
        chunked = run()
    finally:
        rdtail.CHUNKS = old
        rdtail._tail_fn.cache_clear()
    for a, b in zip(single, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("order", ["hwnc", "nhwc"])
def test_block_fused_matches_unfused(order, monkeypatch):
    """rdnet.Block with the kernel == the plain XLA path (f32 exact-gelu
    interpret mode; both row-view orders)."""
    monkeypatch.setattr(rdtail, "ORDER", order)
    rngs = nnx.Rngs(0)
    block = Block(C, INTER, G, ese=True, rngs=rngs)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 16, 8, C)).astype(np.float32))
    fused = block(x)
    with monkeypatch.context() as mp:
        mp.setattr(rdtail, "MODE", "off")
        ref = block(x)
    assert fused.shape == ref.shape == (2, 16, 8, G)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_block_train_grads_match_unfused(monkeypatch):
    """Full Block loss grads: fused kernel VJP == XLA autodiff."""
    rngs = nnx.Rngs(0)
    block = Block(C, INTER, G, rngs=rngs)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 16, 8, C)).astype(np.float32))

    def loss(block, x):
        return jnp.mean(block(x) ** 2)

    fused = nnx.grad(loss)(block, x)
    with monkeypatch.context() as mp:
        mp.setattr(rdtail, "MODE", "off")
        ref = nnx.grad(loss)(block, x)
    flat_f = jax.tree.leaves(fused)
    flat_r = jax.tree.leaves(ref)
    assert len(flat_f) == len(flat_r) > 0
    for a, b in zip(flat_f, flat_r):
        scale = max(1e-3, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5 * scale)


def test_eligibility_gates():
    assert rdtail.eligible(4096, C, INTER, G, jnp.float32, train=True)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(rdtail, "MODE", "off")
        assert not rdtail.eligible(4096, C, INTER, G, jnp.float32, train=True)
        mp.setattr(rdtail, "MODE", "auto")
        # off-TPU (CPU backend) never takes the compiled kernel
        assert not rdtail.eligible(4096, C, INTER, G, jnp.bfloat16, train=True)
    # mesh scope disables the kernel (pallas is not SPMD-partitionable)
    from pssr2_tpu.ops.pallas.guard import mesh_scope

    with mesh_scope():
        assert not rdtail.eligible(4096, C, INTER, G, jnp.float32, train=True)
    # footprint gate: an absurdly wide tail falls back
    assert not rdtail.eligible(1 << 20, 4096, 16384, 4096, jnp.float32, train=True)


def test_full_rdresunet_fused_matches_unfused(monkeypatch):
    """Tiny RDResUNet forward: kernel on (interpret) == kernel off."""
    from pssr2_tpu.models import RDResUNet

    kw = dict(
        hidden=[32, 24], rdnet_init=16, growth_rates=(8, 8), ds_blocks=(False, True),
        ese_blocks=(False, True), n_blocks=2, scale=2,
    )
    model = RDResUNet(**kw, rngs=nnx.Rngs(0))
    model.eval()
    x = jnp.asarray(
        np.random.default_rng(6).integers(0, 255, (1, 1, 32, 32)).astype(np.float32)
    )
    fused = model(x)
    with monkeypatch.context() as mp:
        mp.setattr(rdtail, "MODE", "off")
        ref = model(x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4, rtol=1e-5)


def test_scan_trainer_with_fused_tail(monkeypatch):
    """The nnx.scan multi-step trainer (train_paired steps_per_dispatch=K)
    traces the fused tail kernel inside the scan body without issue and
    matches the per-step path's losses."""
    import jax
    from pssr2_tpu.models import RDResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_multi_train_step, _build_paired_steps
    from pssr2_tpu.util import MSELoss

    def gen_pair(key, batch, augment):
        hr = batch.astype(jnp.float32)
        return hr, hr[:, :, ::4, ::4]

    def make():
        model = RDResUNet(
            hidden=[16, 8], rdnet_init=8, growth_rates=(8, 8), ds_blocks=(False, True),
            ese_blocks=(False, True), n_blocks=2, scale=4, rngs=nnx.Rngs(0),
        )
        model.train()
        optim = AdamW(1e-3)
        return model, nnx.Optimizer(model, optim.tx, wrt=nnx.Param), optim

    rng = np.random.default_rng(0)
    batches = jnp.asarray(rng.integers(0, 255, (2, 4, 1, 32, 32)), jnp.uint8)
    keys = jax.random.split(jax.random.key(0), 2)

    m1, o1, opt = make()
    multi = _build_multi_train_step(MSELoss(), False, gen_pair)
    losses = multi(m1, o1, batches, None, keys, opt.lr)
    assert np.isfinite(np.asarray(losses)).all()

    m2, o2, _ = make()
    step, _ = _build_paired_steps(MSELoss(), False, gen_pair)
    per_step = []
    for i in range(2):
        loss, _, _ = step(m2, o2, batches[i], None, keys[i], opt.lr, 4, True)
        per_step.append(float(loss))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(per_step), rtol=2e-5)
