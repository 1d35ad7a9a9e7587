"""Lane-fold execution parity (models/resunet.FOLD_LANES): folding two
batch samples into channels with block-diagonal convs + fold-aware BN must
reproduce the unfolded model — forward (train and eval), gradients, and
BN running-statistic updates — up to fp reassociation of the half sums."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from pssr2_tpu.models import ResUNet
from pssr2_tpu.models import resunet as resunet_mod


@pytest.fixture
def toggle_fold(monkeypatch):
    def set_mode(mode):
        monkeypatch.setattr(resunet_mod, "FOLD_LANES", mode)

    return set_mode


def _model():
    return ResUNet(hidden=[8, 16], depth=1, scale=2)


def _batch(b=4, res=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((b, 1, res, res)).astype(np.float32) * 255)


def test_bn_train_folded_matches_unfolded():
    from pssr2_tpu.ops.batchnorm import bn_train, bn_train_folded

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((6, 8, 8, 10)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(10) * 0.2 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(10) * 0.1, jnp.float32)
    xf = jnp.concatenate([x[:3], x[3:]], axis=-1)

    y, mu, var = bn_train(x, scale, bias, 1e-5)
    yf, muf, varf = bn_train_folded(xf, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(muf), np.asarray(mu), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(varf), np.asarray(var), rtol=1e-5, atol=1e-6)
    y_back = jnp.concatenate([yf[..., :10], yf[..., 10:]], axis=0)
    np.testing.assert_allclose(np.asarray(y_back), np.asarray(y), rtol=1e-5, atol=1e-5)

    # gradients
    def loss_plain(x, s, b):
        y, mu, var = bn_train(x, s, b, 1e-5)
        return (y**2).mean() + (mu * var).sum() * 0.1

    def loss_fold(x, s, b):
        xf = jnp.concatenate([x[:3], x[3:]], axis=-1)
        y, mu, var = bn_train_folded(xf, s, b, 1e-5)
        return (y**2).mean() + (mu * var).sum() * 0.1

    g0 = jax.grad(loss_plain, argnums=(0, 1, 2))(x, scale, bias)
    g1 = jax.grad(loss_fold, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-6)


def test_folded_forward_matches_unfolded_train_and_eval(toggle_fold):
    batch = _batch()
    for train in (True, False):
        toggle_fold(False)
        m0 = _model()
        m0.train() if train else m0.eval()
        want = np.asarray(m0(batch))

        toggle_fold(True)
        m1 = _model()
        m1.train() if train else m1.eval()
        got = np.asarray(m1(batch))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)

        if train:
            # BN running-stat updates must agree per TRUE channel
            s0 = np.asarray(m0.encoder[0].norms[0].mean[...])
            s1 = np.asarray(m1.encoder[0].norms[0].mean[...])
            np.testing.assert_allclose(s1, s0, rtol=1e-5, atol=1e-6)
            v0 = np.asarray(m0.encoder[0].norms[0].var[...])
            v1 = np.asarray(m1.encoder[0].norms[0].var[...])
            np.testing.assert_allclose(v1, v0, rtol=1e-4, atol=1e-6)


def test_folded_gradients_match_unfolded(toggle_fold):
    batch = _batch(seed=5)
    target = _batch(b=4, res=64, seed=6)

    def run(mode):
        toggle_fold(mode)
        model = _model()
        model.train()

        def loss_fn(model):
            out = model(batch)
            return ((out - target) ** 2).mean() / 255.0**2

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        flat = jax.tree.leaves(grads)
        return float(loss), flat

    l0, g0 = run(False)
    l1, g1 = run(True)
    assert l0 == pytest.approx(l1, rel=1e-5)
    assert len(g0) == len(g1)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)


def test_fold_gating(toggle_fold):
    # odd batch -> no fold even when forced
    toggle_fold(True)
    m = _model()
    m.eval()
    out = m(_batch(b=3, seed=7))
    assert out.shape == (3, 1, 64, 64)
    # auto on CPU -> unfolded
    toggle_fold("auto")
    assert not resunet_mod._fold_lanes_enabled(4)
