"""SSIMLoss/normalize_preds contracts (reference-style: tests/test_util.py)
plus checkpoint round-trips, scheduler behavior and the declaration parser."""

import numpy as np
import jax.numpy as jnp
import pytest

from pssr2_tpu.checkpoint import load_weights, load_train_state, save_train_state, save_weights
from pssr2_tpu.declaration import handle_declaration, parse_declaration
from pssr2_tpu.models import ResUNet
from pssr2_tpu.optim import AdamW, ExponentialLR, ReduceLROnPlateau
from pssr2_tpu.util import SSIMLoss, normalize_preds

from _util import get_image, get_shape

HR_RES = 256
HR_SHAPE = get_shape(HR_RES)


@pytest.mark.parametrize("kwargs", [{}, dict(mix=1), dict(mix=0), dict(ms=False)], ids=["default", "mix1", "mix0", "ssim"])
def test_ssimloss(kwargs):
    a = jnp.asarray(get_image(HR_SHAPE, seed=0) / 255, dtype=jnp.float32)
    b = jnp.asarray(get_image(HR_SHAPE, seed=1) / 255, dtype=jnp.float32)
    out = SSIMLoss(**kwargs)(a, b)
    assert out.shape == ()
    per = SSIMLoss(**kwargs).per_sample(a, b)
    assert per.shape == (2,)
    # per-sample mean == scalar loss
    np.testing.assert_allclose(float(per.mean()), float(out), rtol=1e-5)


def test_normalize_preds():
    hr = get_image(HR_SHAPE, seed=2)
    hr_hat = get_image(HR_SHAPE, seed=3)
    a, b = normalize_preds(hr, hr_hat)
    assert a.shape == b.shape == (2, 1, HR_RES, HR_RES)

    a, b = normalize_preds(hr[0], hr_hat[0])
    assert a.shape == b.shape == (1, HR_RES, HR_RES)

    small = get_image(get_shape(HR_RES // 4, batch=0))
    a, b = normalize_preds(hr[0], small)
    assert a.shape == (1, HR_RES, HR_RES)
    assert b.shape == (1, HR_RES // 4, HR_RES // 4)


def test_weights_roundtrip(tmp_path):
    model = ResUNet(hidden=[8, 16], depth=1)
    model.eval()
    x = jnp.asarray(get_image((1, 1, 32, 32), seed=4), dtype=jnp.float32)
    want = np.asarray(model(x))

    save_weights(model, tmp_path / "w.npz")
    model2 = ResUNet(hidden=[8, 16], depth=1, rngs=__import__("flax").nnx.Rngs(42))
    model2.eval()
    assert not np.allclose(np.asarray(model2(x)), want)
    load_weights(model2, tmp_path / "w.npz")
    np.testing.assert_allclose(np.asarray(model2(x)), want, atol=1e-5)

    # shape mismatch raises
    model3 = ResUNet(hidden=[16, 32], depth=1)
    with pytest.raises((ValueError, KeyError)):
        load_weights(model3, tmp_path / "w.npz")


def test_train_state_roundtrip(tmp_path):
    model = ResUNet(hidden=[8, 16], depth=1)
    optim = AdamW(1e-3)
    from flax import nnx

    graphdef, params, _ = nnx.split(model, nnx.Param, ...)
    opt_state = optim.init(params)
    save_train_state(tmp_path / "ckpt", model, opt_state=None, step=7)

    model2 = ResUNet(hidden=[8, 16], depth=1, rngs=nnx.Rngs(9))
    model2, _, step = load_train_state(tmp_path / "ckpt", model2)
    assert step == 7
    x = jnp.asarray(get_image((1, 1, 32, 32), seed=5), dtype=jnp.float32)
    model.eval()
    model2.eval()
    np.testing.assert_allclose(np.asarray(model2(x)), np.asarray(model(x)), atol=1e-5)


def test_schedulers():
    optim = AdamW(1e-3)
    sched = ExponentialLR(optim, 0.5)
    sched.step()
    assert optim.lr == pytest.approx(5e-4)

    optim2 = AdamW(1e-3)
    plateau = ReduceLROnPlateau(optim2, patience=1, factor=0.1)
    plateau.step(1.0)
    plateau.step(1.0)  # bad 1
    plateau.step(1.0)  # bad 2 > patience -> reduce
    assert optim2.lr == pytest.approx(1e-4)


def test_declaration_parser():
    model = parse_declaration("ResUNet(hidden=[8, 16], depth=1)")
    assert type(model).__name__ == "ResUNet"

    crap = parse_declaration("MultiCrappifier(Poisson(), AdditiveGaussian(intensity=5), clip=False)")
    assert len(crap.crappifiers) == 2

    # bare default name == no-arg constructor (reference CLI surface)
    model = handle_declaration("ResUNet", ["ResUNet"])
    assert type(model).__name__ == "ResUNet"

    for evil in [
        '__import__("os").system("true")',
        "open('/etc/passwd')",
        "ResUNet(hidden=__import__('os'))",
        "lambda: 1",
    ]:
        with pytest.raises((ValueError, SyntaxError)):
            parse_declaration(evil)


def test_step_timer():
    import time

    from pssr2_tpu.profiler import StepTimer

    timer = StepTimer(warmup=0)
    for _ in range(4):
        timer({"n_valid": 8})
        time.sleep(0.01)
    s = timer.summary()
    assert s["steps"] == 3
    assert s["patches_per_sec"] > 0
    assert s["mean_step_ms"] >= 10


def test_local_batch_slice():
    from pssr2_tpu.parallel.distributed import local_batch_slice

    start, stop = local_batch_slice(32)
    assert (start, stop) == (0, 32)  # single-process


def test_lr_finder(tmp_path):
    from pssr2_tpu.data import ImageDataset
    from pssr2_tpu.optim import lr_finder
    from pssr2_tpu.util import MSELoss
    from _util import make_tifs, get_shape

    make_tifs(tmp_path / "imgs", get_shape(64, batch=4))
    dataset = ImageDataset(tmp_path / "imgs", hr_res=64)
    model = ResUNet(hidden=[8, 16], depth=1)

    import numpy as np
    from flax import nnx

    before = nnx.to_pure_dict(nnx.state(model, nnx.Param))
    lrs, losses, suggested = lr_finder(model, dataset, batch_size=2, loss_fn=MSELoss(), n_steps=8)
    assert len(lrs) == len(losses) > 0
    assert lrs[0] < suggested <= 1.0
    # caller's model untouched
    after = nnx.to_pure_dict(nnx.state(model, nnx.Param))
    for a, b in zip(__import__("jax").tree.leaves(before), __import__("jax").tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_profiler_trace(tmp_path):
    import jax.numpy as jnp

    from pssr2_tpu.profiler import annotate, trace

    with trace(str(tmp_path / "prof")):
        with annotate("work"):
            (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    # a plugins/profile/<ts>/ dir with trace artifacts appears
    produced = list((tmp_path / "prof").rglob("*"))
    assert produced, "profiler wrote no trace artifacts"
