"""End-to-end training smoke tests (reference-style: tests/test_train.py)
plus device-pipeline and mesh data-parallel coverage the reference lacks."""

import jax
import numpy as np
import pytest

from pssr2_tpu.bayes import Real
from pssr2_tpu.crappifiers import AdditiveGaussian
from pssr2_tpu.data import ImageDataset
from pssr2_tpu.models import ResUNet
from pssr2_tpu.optim import AdamW, ExponentialLR
from pssr2_tpu.parallel import data_mesh
from pssr2_tpu.train import approximate_crappifier, train_crappifier, train_paired
from pssr2_tpu.util import MSELoss

from _util import get_shape, make_tifs

HR = 128  # small for CPU test budget; bench runs 512 on TPU
SMALL = dict(hidden=[8, 16], depth=1)


def _dataset(tmp_path, n=5, **kwargs):
    make_tifs(tmp_path / "images", get_shape(HR, batch=n))
    return ImageDataset(tmp_path / "images", hr_res=HR, **kwargs)


def test_train_paired_device_pipeline(tmp_path):
    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL)
    optim = AdamW(lr=1e-3)

    losses = train_paired(
        model, dataset, batch_size=2, loss_fn=MSELoss(), optim=optim, epochs=1,
        collage_dir=str(tmp_path), checkpoint_dir=str(tmp_path / "ckpt"),
        scheduler=ExponentialLR(optim, 0.7),
    )
    assert len(losses) == 2
    train_losses, val_losses = losses
    assert len(val_losses) == 1
    assert all(np.isfinite(v) for v in train_losses + val_losses)
    assert list((tmp_path).glob("epoch0_*.png"))


def test_train_paired_host_pipeline(tmp_path):
    # transforms force the host (parity) path
    dataset = _dataset(tmp_path, transforms=[lambda x: x])
    model = ResUNet(**SMALL)
    losses = train_paired(model, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=1)
    assert len(losses) == 2


def test_train_paired_mesh(tmp_path):
    # data-parallel over the virtual 8-device CPU mesh
    mesh = data_mesh()
    assert mesh.devices.size == 8
    dataset = _dataset(tmp_path, n=8)
    model = ResUNet(**SMALL)
    losses = train_paired(
        model, dataset, batch_size=8, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=1, mesh=mesh
    )
    assert len(losses) == 2
    assert all(np.isfinite(v) for v in losses[0])


def test_train_callbacks_and_locals(tmp_path):
    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL)
    seen = []

    def spy(ls):
        seen.append(ls["batch_idx"])

    train_paired(model, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=1, callbacks=[spy])
    assert seen  # callback received locals each batch


def test_approximate_crappifier(tmp_path):
    crappifier = AdditiveGaussian
    dataset = _dataset(tmp_path, crappifier=AdditiveGaussian())

    space = [Real(0, 15), Real(-10, 10)]
    result = approximate_crappifier(crappifier, space, dataset, opt_kwargs=dict(n_calls=5, n_initial_points=5))
    assert len(result.x) == len(space)
    assert type(crappifier(*result.x)) is crappifier


def test_train_crappifier(tmp_path):
    # untested (and broken) in the reference; smoke-covered here
    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL, scale=1)
    losses = train_crappifier(model, dataset, batch_size=2, optim=AdamW(1e-4), epochs=1)
    assert len(losses) == 2
    assert all(np.isfinite(v) for v in losses[0])


def test_train_state_dir_resume(tmp_path):
    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL)
    optim = AdamW(1e-3)
    state_dir = tmp_path / "state"
    train_paired(model, dataset, batch_size=2, loss_fn=MSELoss(), optim=optim, epochs=1, state_dir=str(state_dir))
    assert list(state_dir.glob("epoch_*"))

    # resuming with epochs=1 must skip training entirely (epoch 0 done)
    model2 = ResUNet(**SMALL)
    losses = train_paired(model2, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=1, state_dir=str(state_dir))
    assert losses == ([], [])

    # and epochs=2 resumes at epoch 1
    model3 = ResUNet(**SMALL)
    train_losses, val_losses = train_paired(
        model3, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=2, state_dir=str(state_dir)
    )
    assert len(val_losses) == 1


def test_train_asymmetric_frames(tmp_path):
    # multi-frame temporal-stack SR: 1 LR frame -> 3 HR frames
    make_tifs(tmp_path / "mf", get_shape(HR, batch=4, channels=6))
    dataset = ImageDataset(tmp_path / "mf", hr_res=HR, n_frames=[1, 3])
    model = ResUNet(channels=[1, 3], **SMALL)
    losses, _ = train_paired(model, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=1)
    assert all(np.isfinite(v) for v in losses)


def test_sigterm_graceful_save(tmp_path):
    import os as _os
    import signal as _signal

    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL)
    state_dir = tmp_path / "state"

    fired = []

    def send_term(_locals):
        if not fired:
            fired.append(True)
            _os.kill(_os.getpid(), _signal.SIGTERM)

    with pytest.raises(SystemExit):
        train_paired(
            model, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=3,
            state_dir=str(state_dir), callbacks=[send_term],
        )
    assert list(state_dir.glob("epoch_*"))  # state saved before exit


def test_abort_callback_no_thread_leak(tmp_path):
    # napari-style abort: callback raises InterruptedError mid-epoch; the
    # prefetch producer must wind down instead of lingering blocked
    import threading

    dataset = _dataset(tmp_path, n=8)
    model = ResUNet(**SMALL)

    def abort(_locals):
        raise InterruptedError("cancelled")

    before = threading.active_count()
    with pytest.raises(InterruptedError):
        train_paired(model, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=1, callbacks=[abort])
    import time

    time.sleep(1.0)  # give the producer its timeout window
    assert threading.active_count() <= before + 1


def test_train_clamp_and_plateau(tmp_path):
    from pssr2_tpu.optim import ReduceLROnPlateau

    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL)
    optim = AdamW(1e-3)
    sched = ReduceLROnPlateau(optim, patience=0, factor=0.5)
    losses, val = train_paired(
        model, dataset, batch_size=2, loss_fn=MSELoss(), optim=optim, epochs=3,
        clamp=True, scheduler=sched,
    )
    assert len(val) == 3
    # plateau scheduler received the val metric (patience=0: any non-improving
    # epoch halves the lr)
    assert optim.lr <= 1e-3


def test_train_paired_on_paired_dataset(tmp_path):
    from pssr2_tpu.data import PairedImageDataset

    make_tifs(tmp_path / "hr", get_shape(HR, batch=4))
    make_tifs(tmp_path / "lr", get_shape(HR // 4, batch=4))
    dataset = PairedImageDataset(tmp_path / "hr", tmp_path / "lr", hr_res=HR, val_split=0.5, split_seed=0)
    model = ResUNet(**SMALL)
    losses, val = train_paired(model, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=1)
    assert all(np.isfinite(v) for v in losses) and len(val) == 1


def test_custom_host_crappifier_uses_device_pipeline(tmp_path):
    """A user-defined Crappifier subclass (no device lowering) still trains
    through the uint8 PatchLoader fast path: augment/downscale run fused on
    device, the crappify step runs on host via io_callback (VERDICT r1 #10)."""
    from pssr2_tpu.crappifiers import Crappifier
    from pssr2_tpu.data import ImageDataset
    from pssr2_tpu.train import _use_device_pipeline

    calls = {"n": 0}

    class MyCrappifier(Crappifier):
        def crappify(self, image):
            calls["n"] += 1
            return np.clip(image + 3.0, 0, 255)

    make_tifs(tmp_path / "images", get_shape(32, batch=4))
    dataset = ImageDataset(tmp_path / "images", hr_res=32, crappifier=MyCrappifier(), val_split=0.25)
    assert _use_device_pipeline(dataset) == "callback"

    model = ResUNet(hidden=[4, 8], depth=1, scale=4)
    train_losses, val_losses = train_paired(
        model, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=1
    )
    assert calls["n"] > 0  # the host crappifier actually ran inside the jit
    assert np.isfinite(val_losses[-1])


def test_train_paired_steps_per_dispatch_parity(tmp_path):
    """steps_per_dispatch>1 fuses full batches into one nnx.scan dispatch;
    the recorded loss surface (log_frequency batches + validation) must
    match the per-step path to fp-reassociation level."""
    dataset = _dataset(tmp_path, n=12)

    def run(spd):
        import random

        random.seed(0)  # the train sampler shuffles via the global RNG
        model = ResUNet(**SMALL, rngs=None)
        return train_paired(
            model, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3),
            epochs=1, log_frequency=3, seed=7, steps_per_dispatch=spd,
        )

    t1, v1 = run(1)
    t3, v3 = run(3)
    assert len(t1) == len(t3) and len(v1) == len(v3)
    np.testing.assert_allclose(t3, t1, rtol=1e-4)
    np.testing.assert_allclose(v3, v1, rtol=1e-4)


def test_train_paired_steps_per_dispatch_mesh(tmp_path):
    """steps_per_dispatch over a data mesh: stacked (K, B, ...) batches are
    resharded P(None, 'data') and the scan trainer runs sharded."""
    from pssr2_tpu.parallel import data_mesh

    mesh = data_mesh()
    dataset = _dataset(tmp_path, n=16)
    model = ResUNet(**SMALL)
    train_losses, val_losses = train_paired(
        model, dataset, batch_size=8, loss_fn=MSELoss(), optim=AdamW(1e-3),
        epochs=1, log_frequency=4, mesh=mesh, steps_per_dispatch=2,
    )
    assert all(np.isfinite(v) for v in train_losses + val_losses)


def test_train_paired_steps_per_dispatch_host_pairs(tmp_path):
    """steps_per_dispatch on the host (hr, lr) pair loader: tuple batches
    are stacked per component before the scan."""
    dataset = _dataset(tmp_path, n=8, transforms=[lambda x: x])  # forces host path
    model = ResUNet(**SMALL)
    train_losses, val_losses = train_paired(
        model, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3),
        epochs=1, log_frequency=2, steps_per_dispatch=2,
    )
    assert all(np.isfinite(v) for v in train_losses + val_losses)
