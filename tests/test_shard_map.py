"""shard_map data-parallel path: sync-BN statistics, key-block-matched
device degradation, and the explicit-collective train step must match the
single-program (pjit) path numerically (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pssr2_tpu.ops import batchnorm as bn


def _mesh():
    return Mesh(np.asarray(jax.devices()[:4]), ("data",))


def test_sync_bn_matches_single_program():
    """bn_train inside shard_map with sync_axis == bn_train on the full
    batch: outputs, stats, input grads, and (pmean'd) parameter grads."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 4, 4, 16)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(16).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)
    gy = jnp.asarray(rng.standard_normal((8, 4, 4, 16)).astype(np.float32))

    def loss(x_, s_, b_):
        y, mu, var = bn.bn_train(x_, s_, b_, 1e-5)
        return jnp.sum(y * gy_ref[: x_.shape[0]]), (y, mu, var)

    # single-program reference
    gy_ref = gy
    (ref_l, (ref_y, ref_mu, ref_var)), ref_g = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True
    )(x, scale, bias)

    mesh = _mesh()

    def local(x_, gy_, s_, b_):
        with bn.sync_axis("data"):
            def loss_l(x__, s__, b__):
                y, mu, var = bn.bn_train(x__, s__, b__, 1e-5)
                return jnp.sum(y * gy_), (y, mu, var)

            (l, (y, mu, var)), g = jax.value_and_grad(
                loss_l, argnums=(0, 1, 2), has_aux=True
            )(x_, s_, b_)
            l = jax.lax.psum(l, "data")
            # parameter grads: local sums -> psum == global sums (the
            # train step pmean-averages; psum here matches the unsharded
            # sum-loss objective of this test)
            gs = jax.lax.psum(g[1], "data")
            gb = jax.lax.psum(g[2], "data")
        return l, y, mu, var, g[0], gs, gb

    sm = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P(), P()),
            out_specs=(P(), P("data"), P(), P(), P("data"), P(), P()),
        )
    )
    l, y, mu, var, gx, gs, gb = sm(x, gy, scale, bias)
    np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(ref_mu), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_g[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ref_g[1]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ref_g[2]), atol=1e-5, rtol=1e-5)


def _dataset(tmp_path, n=8, res=64):
    from pssr2_tpu.data import ImageDataset, tiff

    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    yy, xx = np.mgrid[0:res, 0:res]
    for i in range(n):
        img = np.clip(
            127 + 100 * np.sin(xx / (2 + i)) * np.cos(yy / (3 + i)) + rng.normal(0, 5, (res, res)),
            0, 255,
        )
        tiff.imwrite(str(d / f"{i}.tif"), img.astype(np.uint8))
    return ImageDataset(d, hr_res=res, val_split=0.25)


def test_shard_map_dp_matches_single_and_pjit(tmp_path, monkeypatch):
    """train_paired(dp_shard_map=True): loss sequences equal the
    single-device run to float tolerance — sync-BN, key-block degradation,
    and grad pmean reproduce the global math.  Full batches (16 images,
    batch 4) so the shard_map step genuinely executes — asserted via a
    counting wrapper (partial batches route through the pjit fallback)."""
    import pssr2_tpu.train as train_mod
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.parallel import data_mesh
    from pssr2_tpu.train import train_paired
    from pssr2_tpu.util import MSELoss

    dataset = _dataset(tmp_path, n=16)
    assert (len(dataset) - len(dataset.val_idx)) % 4 == 0  # FULL batches of 4

    counts = {"train": 0, "val": 0}
    orig_build = train_mod._build_shard_map_steps

    def counting_build(*a, **k):
        ts, vs = orig_build(*a, **k)

        def ts2(*aa, **kk):
            counts["train"] += 1
            return ts(*aa, **kk)

        def vs2(*aa, **kk):
            counts["val"] += 1
            return vs(*aa, **kk)

        return ts2, vs2

    def run(mesh, dp_shard_map=False):
        import random

        random.seed(3)
        np.random.seed(3)
        model = ResUNet(hidden=[8, 16], depth=1)
        return train_paired(
            model, dataset, batch_size=4, loss_fn=MSELoss(), optim=AdamW(1e-3),
            epochs=1, log_frequency=1, seed=11, mesh=mesh, dp_shard_map=dp_shard_map,
        )

    a_losses, a_val = run(None)
    monkeypatch.setattr(train_mod, "_build_shard_map_steps", counting_build)
    s_losses, s_val = run(data_mesh(4), dp_shard_map=True)
    assert counts["train"] >= 2 and counts["val"] >= 1
    np.testing.assert_allclose(a_losses, s_losses, rtol=2e-4)
    np.testing.assert_allclose(a_val, s_val, rtol=2e-4)


def test_shard_map_requires_mesh():
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import train_paired
    from pssr2_tpu.util import MSELoss

    with pytest.raises(ValueError, match="requires a mesh"):
        train_paired(
            ResUNet(hidden=[8, 16], depth=1), None, batch_size=8,
            loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=1, dp_shard_map=True,
        )


def test_fused_kernels_eligible_inside_shard_map(tmp_path):
    """The reason dp_shard_map exists: inside the shard_map body each
    device runs the single-chip program, so the fused SwinIR train kernels
    (gated OFF under pjit by ops/pallas/guard) stay eligible and actually
    trace."""
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.models import SwinIR
    from pssr2_tpu.ops.pallas import swinblock
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_shard_map_steps
    from pssr2_tpu.util import MSELoss

    mesh = _mesh()
    model = SwinIR(
        image_size=16, embed_dim=24, depths=[2], num_heads=[2], window_size=8,
        scale=4, drop_path_rate=0.0,
    )
    model.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)

    def gen_pair(key, batch, augment, key_block=None):
        hr = batch.astype(jnp.float32)
        lr = hr[:, :, ::4, ::4]
        return hr, lr

    train_step, _ = _build_shard_map_steps(MSELoss(), False, gen_pair, mesh, 8)

    calls = []
    orig = swinblock.fused_swin_block_train

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    old_mode = swinblock.MODE
    swinblock.MODE = "interpret"
    swinblock.fused_swin_block_train = spy
    try:
        batch = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (8, 1, 64, 64)), jnp.uint8
        )
        loss, _, _ = train_step(
            model, optimizer, batch, None, jax.random.key(0), optim.lr, 8, False
        )
        assert np.isfinite(float(loss))
        assert calls, "fused train kernel was not traced inside shard_map"
    finally:
        swinblock.MODE = old_mode
        swinblock.fused_swin_block_train = orig


def test_shard_map_host_pair_batches(tmp_path):
    """gen_pair=None branch: ready (hr, lr) TUPLE batches shard over the
    mesh (prefix specs) and the loss matches the single-program step."""
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps, _build_shard_map_steps
    from pssr2_tpu.util import MSELoss

    mesh = _mesh()
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((8, 1, 64, 64)).astype(np.float32) * 255)
    lr = jnp.asarray(rng.random((8, 1, 16, 16)).astype(np.float32) * 255)

    def make():
        model = ResUNet(hidden=[8, 16], depth=1)
        model.train()
        optim = AdamW(1e-3)
        return model, nnx.Optimizer(model, optim.tx, wrt=nnx.Param), optim

    m1, o1, opt = make()
    sm_step, _ = _build_shard_map_steps(MSELoss(), False, None, mesh, 8)
    sm_loss, _, _ = sm_step(m1, o1, (hr, lr), None, jax.random.key(0), opt.lr, 8, False)

    m2, o2, _ = make()
    ref_step, _ = _build_paired_steps(MSELoss(), False, None)
    ref_loss, _, _ = ref_step(m2, o2, (hr, lr), None, jax.random.key(0), opt.lr, 8, False)
    np.testing.assert_allclose(float(sm_loss), float(ref_loss), rtol=2e-5)


def test_rdtail_kernel_eligible_inside_shard_map():
    """Same contract for the fused RDNet block-tail kernel
    (ops/pallas/rdtail): inside the shard_map body it stays eligible and
    traces (interpret mode stands in for the TPU lowering — the hardware
    proof is experiments/shardmap_tpu_check.py)."""
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.models import RDResUNet
    from pssr2_tpu.ops.pallas import rdtail
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_shard_map_steps
    from pssr2_tpu.util import MSELoss

    mesh = _mesh()
    model = RDResUNet(
        hidden=[16, 8], rdnet_init=8, growth_rates=(8, 8), ds_blocks=(False, True),
        ese_blocks=(False, True), n_blocks=2, scale=4,
    )
    model.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)

    def gen_pair(key, batch, augment, key_block=None):
        hr = batch.astype(jnp.float32)
        lr = hr[:, :, ::4, ::4]
        return hr, lr

    train_step, _ = _build_shard_map_steps(MSELoss(), False, gen_pair, mesh, 8)

    calls = []
    orig = rdtail.fused_rd_tail

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    old_mode = rdtail.MODE
    rdtail.MODE = "interpret"
    rdtail.fused_rd_tail = spy
    try:
        batch = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (8, 1, 64, 64)), jnp.uint8
        )
        loss, _, _ = train_step(
            model, optimizer, batch, None, jax.random.key(0), optim.lr, 8, False
        )
        assert np.isfinite(float(loss))
        assert calls, "fused rd tail kernel was not traced inside shard_map"
    finally:
        rdtail.MODE = old_mode
        rdtail.fused_rd_tail = orig
