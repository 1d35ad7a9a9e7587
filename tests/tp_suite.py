"""Tensor-parallel sharding rules on the (data, model) mesh.

SURVEY.md §2.4 TP row: rules are layout annotations only, so TP forward /
train results must match the unsharded computation (XLA inserts the
collectives).  Runs on the virtual 8-CPU-device mesh (2 data x 4 model).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from pssr2_tpu.models import SwinIR
from pssr2_tpu.optim import AdamW
from pssr2_tpu.parallel.mesh import batch_sharding, data_model_mesh
from pssr2_tpu.parallel.tp import SWINIR_TP_RULES, shard_module, tp_shardings


def _tiny_swinir():
    # embed_dim 16, heads 4 -> qkv (16, 48): 48 % 4 == 0, head-aligned on
    # the 4-way model axis; mlp hidden 32 % 4 == 0.
    return SwinIR(
        image_size=16,
        window_size=4,
        embed_dim=16,
        depths=[1, 1],
        num_heads=[4, 4],
        mlp_ratio=2,
        scale=2,
        drop_path_rate=0.0,
    )


def _forward(model, x):
    graphdef, state = nnx.split(model)

    @jax.jit
    def fn(state, x):
        return nnx.merge(graphdef, state)(x)

    return np.asarray(fn(state, x))


def test_tp_rules_shard_expected_leaves():
    mesh = data_model_mesh(model_parallel=4)
    model = _tiny_swinir()
    n = shard_module(model, mesh, SWINIR_TP_RULES)
    # 2 RSTBs x 1 block x 6 linears (qkv k/b, proj k, fc1 k/b, fc2 k)
    # + conv_before_upsample k/b + upsample k/b (one stage at scale=2).
    assert n == 2 * 6 + 4
    qkv = model.layers[0].residual_group.blocks[0].attn.qkv
    assert qkv.kernel.value.sharding.spec == P(None, "model")
    proj = model.layers[0].residual_group.blocks[0].attn.proj
    assert proj.kernel.value.sharding.spec == P("model", None)
    # replicated leaves stay replicated
    assert model.conv_first.kernel.value.sharding.spec == P()


def test_tp_indivisible_dims_fall_back_to_replication():
    mesh = data_model_mesh(model_parallel=4)
    # embed_dim 6 -> qkv (6, 18): 18 % 4 != 0 -> replicate, still correct.
    model = SwinIR(
        image_size=16, window_size=4, embed_dim=6, depths=[1], num_heads=[2],
        mlp_ratio=2, scale=2, drop_path_rate=0.0,
    )
    state = nnx.state(model, nnx.Param)
    shardings = tp_shardings(state, mesh, SWINIR_TP_RULES)
    qkv_s = shardings["layers"][0]["residual_group"]["blocks"][0]["attn"]["qkv"]["kernel"]
    assert qkv_s.value.spec == P()


def test_tp_forward_matches_unsharded():
    mesh = data_model_mesh(model_parallel=4)
    x = np.random.default_rng(0).random((4, 1, 16, 16), np.float32) * 255

    ref_model = _tiny_swinir()
    ref_model.eval()
    want = _forward(ref_model, x)

    tp_model = _tiny_swinir()
    tp_model.eval()
    shard_module(tp_model, mesh, SWINIR_TP_RULES)
    xs = jax.device_put(x, batch_sharding(mesh))
    got = _forward(tp_model, xs)

    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_tp_train_step_matches_replicated():
    mesh = data_model_mesh(model_parallel=4)
    rng = np.random.default_rng(1)
    lr = rng.random((4, 1, 16, 16), np.float32).astype(np.float32)
    hr = rng.random((4, 1, 32, 32), np.float32).astype(np.float32)

    def run(tp):
        model = _tiny_swinir()
        model.train()
        optim = AdamW(1e-3)
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        if tp:
            assert shard_module(model, mesh, SWINIR_TP_RULES) > 0
            assert shard_module(optimizer, mesh, SWINIR_TP_RULES) > 0
            lr_b = jax.device_put(lr, batch_sharding(mesh))
            hr_b = jax.device_put(hr, batch_sharding(mesh))
        else:
            lr_b, hr_b = lr, hr

        @nnx.jit
        def step(model, optimizer, lr_b, hr_b):
            def loss_fn(m):
                return jnp.mean((m(lr_b) - hr_b) ** 2)

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            optimizer.update(model, grads)
            return loss

        losses = [float(step(model, optimizer, lr_b, hr_b)) for _ in range(3)]
        return losses

    ref = run(tp=False)
    tp = run(tp=True)
    assert np.isfinite(tp).all()
    np.testing.assert_allclose(tp, ref, rtol=2e-5, atol=2e-6)


def test_train_paired_tp_rules(tmp_path):
    """End-to-end: train_paired on a (data=2, model=4) mesh with TP rules."""
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.datasets import ImageDataset
    from pssr2_tpu.train import train_paired
    from pssr2_tpu.util import SSIMLoss
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32), np.uint8)).save(img_dir / f"{i}.png")

    dataset = ImageDataset(
        img_dir, hr_res=32, lr_scale=2, n_frames=1, crappifier=Poisson(), extension="png"
    )
    model = _tiny_swinir()
    mesh = data_model_mesh(model_parallel=4)
    train_losses, val_losses = train_paired(
        model,
        dataset,
        batch_size=2,
        loss_fn=SSIMLoss(ms=False),
        optim=AdamW(1e-3),
        epochs=1,
        mesh=mesh,
        tp_rules=SWINIR_TP_RULES,
    )
    assert np.isfinite(train_losses).all() and np.isfinite(val_losses).all()
    qkv = model.layers[0].residual_group.blocks[0].attn.qkv
    assert qkv.kernel.value.sharding.spec == P(None, "model")
