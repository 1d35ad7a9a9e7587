"""Cross-framework quality parity: train THIS framework and a torch twin of
the reference architecture (pssr/models/resunet.py) from IDENTICAL initial
weights on IDENTICAL synthetic paired data, and compare final val PSNR.

This closes the round-1 gap "quality parity vs the PyTorch reference is
unproven end-to-end": forward parity was already bitwise-checked
(tests/test_torch_parity.py); this experiment checks the full training
dynamic — optimizer (AdamW, torch defaults), BatchNorm stats, loss scaling,
LR handling — lands within the 0.1 dB budget (BASELINE.md north star).

Both sides see the same fixed crappified LR inputs (crappified once with
the host Poisson crappifier, not per-epoch) and the same batch order, so
the only differences are framework numerics.  PSNR is computed with the
reference's metric convention (pssr/predict.py:144-211: MSE on [0,1],
psnr = -10 log10(mse)).

Run: JAX_PLATFORMS=cpu python experiments/train_parity.py
Writes experiments/train_parity.md.  The pytest wrapper
(tests/test_train_parity.py, slow-marked) runs a reduced setting.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_phantom_data(n_images=40, hr_res=64, lr_scale=4, seed=0):
    """Synthetic microscopy phantoms (Gaussian blobs + 1px filaments) with
    fixed Poisson-crappified LR counterparts, float32 [0,255] NCHW."""
    import numpy as np

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.ops.resize import resize_bilinear_np

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:hr_res, 0:hr_res]
    images = []
    for _ in range(n_images):
        img = np.zeros((hr_res, hr_res), np.float32)
        for _ in range(rng.integers(4, 9)):
            cy, cx = rng.uniform(0, hr_res, 2)
            s = rng.uniform(1.5, 5.0)
            a = rng.uniform(80, 200)
            img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        for _ in range(rng.integers(1, 4)):
            y0, x0 = rng.uniform(0, hr_res, 2)
            ang = rng.uniform(0, np.pi)
            length = rng.uniform(hr_res / 4, hr_res)
            ts = np.arange(0, length, 0.5)
            ys = np.clip(y0 + ts * np.sin(ang), 0, hr_res - 1).astype(int)
            xs = np.clip(x0 + ts * np.cos(ang), 0, hr_res - 1).astype(int)
            img[ys, xs] += rng.uniform(100, 220)
        images.append(np.clip(img + rng.normal(0, 2, img.shape), 0, 255))
    hr = np.stack(images).astype(np.float32)[:, None]  # (N,1,H,W)

    crap = Poisson(intensity=1, gain=0)
    np.random.seed(seed)  # Poisson.crappify draws from the global numpy state
    lr_res = hr_res // lr_scale
    lr = resize_bilinear_np(hr, lr_res, lr_res)
    lr = np.clip(np.round(lr), 0, 255).astype(np.uint8)
    lr = np.stack([crap.crappify(p) for p in lr]).astype(np.float32)
    lr = np.clip(np.round(lr), 0, 255)
    return hr, lr


def _psnr(pred, target):
    """Reference metric convention (pssr/predict.py:187-195): MSE on [0,1],
    psnr = -10 log10(mse)."""
    import numpy as np

    mse = np.mean((pred / 255.0 - target / 255.0) ** 2)
    return float(-10 * np.log10(mse))


def build_torch_twin(model, hidden, depth):
    """Torch twin of the reference ResUNet loaded with the JAX model's
    initial weights (same starting point for both trainings)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_torch_parity import TorchResUNet, _copy_bn, _copy_conv, _copy_resblock

    twin = TorchResUNet(hidden, depth)
    _copy_bn(twin.norm, model.norm)
    for tb, nb in zip(twin.encoder, model.encoder):
        _copy_resblock(tb, nb)
    for tb, nb in zip(twin.decoder, model.decoder):
        _copy_resblock(tb, nb)
    _copy_conv(twin.pre, model.reconstruction.pre)
    _copy_conv(twin.post, model.reconstruction.conv)
    return twin


def run_parity(n_steps=500, n_images=40, batch_size=8, hidden=None, depth=2, seed=0, log=print):
    """Train both frameworks; returns (psnr_jax, psnr_torch)."""
    import numpy as np
    import torch
    import torch.nn.functional as tF
    from flax import nnx

    import jax

    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import MSELoss

    hidden = [16, 32] if hidden is None else hidden
    hr, lr = make_phantom_data(n_images=n_images, seed=seed)
    n_val = max(4, n_images // 5)
    hr_tr, lr_tr, hr_va, lr_va = hr[n_val:], lr[n_val:], hr[:n_val], lr[:n_val]

    model = ResUNet(hidden=hidden, depth=depth)
    twin = build_torch_twin(model, hidden, depth)

    # identical batch orders for both frameworks
    rng = np.random.default_rng(seed + 1)
    n_tr = len(hr_tr)
    orders = [rng.permutation(n_tr) for _ in range(n_steps * batch_size // n_tr + 2)]
    flat = np.concatenate(orders)

    # ---- JAX training (the framework's real train step) ----
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
    train_step, _ = _build_paired_steps(MSELoss(), False, None)
    model.train()
    step = nnx.cached_partial(train_step, model, optimizer)
    key = jax.random.key(0)
    for i in range(n_steps):
        sel = flat[i * batch_size : (i + 1) * batch_size]
        loss, _, _ = step((hr_tr[sel], lr_tr[sel]), None, key, optim.lr, batch_size, False)
        if i % 100 == 0:
            log(f"  jax step {i}: loss {float(loss):.5f}")
    model.eval()
    pred_j = np.asarray(model(lr_va))
    psnr_j = _psnr(pred_j, hr_va)

    # ---- torch training (reference-style loop, same data/batches) ----
    topt = torch.optim.AdamW(twin.parameters(), lr=1e-3)
    twin.train()
    hr_t, lr_t = torch.from_numpy(hr_tr), torch.from_numpy(lr_tr)
    for i in range(n_steps):
        sel = torch.from_numpy(flat[i * batch_size : (i + 1) * batch_size].copy())
        out = twin(lr_t[sel])
        loss = tF.mse_loss(out / 255.0, hr_t[sel] / 255.0)
        topt.zero_grad()
        loss.backward()
        topt.step()
        if i % 100 == 0:
            log(f"  torch step {i}: loss {float(loss):.5f}")
    twin.eval()
    with torch.no_grad():
        pred_t = twin(torch.from_numpy(lr_va)).numpy()
    psnr_t = _psnr(pred_t, hr_va)

    return psnr_j, psnr_t


def main():
    psnr_j, psnr_t = run_parity()
    delta = abs(psnr_j - psnr_t)
    report = f"""# Cross-framework training parity (round 2)

Same initial weights, same fixed crappified data, same batch order,
AdamW(1e-3) torch defaults both sides, MSE on [0,1], 500 steps, batch 8,
ResUNet(hidden=[16,32], depth=2) x4 on 64->16 phantom pairs (CPU, f32).

| framework | val PSNR (dB) |
|---|---|
| pssr2_tpu (JAX) | {psnr_j:.3f} |
| torch twin (reference arch) | {psnr_t:.3f} |
| **delta** | **{delta:.3f}** |

Budget (BASELINE.md north star): <= 0.1 dB.  {"PASS" if delta <= 0.1 else "FAIL"}
"""
    out = os.path.join(os.path.dirname(__file__), "train_parity.md")
    with open(out, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
