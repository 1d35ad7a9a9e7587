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

# Force real CPU: the axon sitecustomize overrides JAX_PLATFORMS after jax
# reads the env, which silently routed earlier parity runs to the tunneled
# TPU (discovered round 3 — the round-2 report's "CPU, f32" claim was wrong
# for the JAX side).  CPU-vs-CPU is the controlled numerics comparison.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def make_phantom_data(n_images=40, hr_res=64, lr_scale=4, seed=0):
    """Synthetic microscopy phantoms (Gaussian blobs + 1px filaments) with
    fixed Poisson-crappified LR counterparts, float32 [0,255] NCHW."""
    import numpy as np

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.ops.resize import resize_bilinear_np

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:hr_res, 0:hr_res]
    # structure density scales with AREA: the counts below were tuned for
    # 64^2; larger sheets would otherwise be mostly flat background, which
    # makes SSIM training ill-conditioned (oscillating losses, multi-dB
    # PSNR spread between identical-numerics frameworks — round-3 finding)
    area = max(1, (hr_res // 64) ** 2)
    images = []
    for _ in range(n_images):
        img = np.zeros((hr_res, hr_res), np.float32)
        for _ in range(rng.integers(4 * area, 9 * area)):
            cy, cx = rng.uniform(0, hr_res, 2)
            s = rng.uniform(1.5, 5.0)
            a = rng.uniform(80, 200)
            img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        for _ in range(rng.integers(1 * area, 4 * area)):
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


class TorchSSIMLoss:
    """Torch twin of util.SSIMLoss: mix*(1 - MS-SSIM) + (1-mix)*windowed-L1
    with pytorch_msssim semantics (the conv2d oracle from
    tests/test_ssim_oracles.py, float32 and differentiable)."""

    def __init__(self, mix=0.8, win_size=11, win_sigma=1.5, ms=True):
        import torch

        self.mix, self.win_size, self.ms = mix, win_size, ms
        coords = torch.arange(win_size, dtype=torch.float32) - win_size // 2
        g = torch.exp(-(coords**2) / (2 * win_sigma**2))
        self.win = (g / g.sum()).reshape(1, 1, 1, -1)
        import torch as _t

        self.weights = _t.tensor((0.0448, 0.2856, 0.3001, 0.2363, 0.1333))

    def _blur(self, x):
        import torch.nn.functional as tF

        out = tF.conv2d(x, self.win, groups=x.shape[1])
        return tF.conv2d(out, self.win.transpose(2, 3), groups=x.shape[1])

    def _parts(self, x, y, data_range=1.0):
        k1, k2 = 0.01, 0.03
        c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
        mu1, mu2 = self._blur(x), self._blur(y)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = self._blur(x * x) - mu1_sq
        s2 = self._blur(y * y) - mu2_sq
        s12 = self._blur(x * y) - mu1_mu2
        cs_map = (2 * s12 + c2) / (s1 + s2 + c2)
        ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
        return ssim_map.flatten(2).mean(-1), cs_map.flatten(2).mean(-1)

    def _ssim_val(self, x, y):
        import torch
        import torch.nn.functional as tF

        if not self.ms:
            s, _ = self._parts(x, y)
            return s.mean()
        mcs = []
        for i in range(5):
            s, cs = self._parts(x, y)
            if i < 4:
                mcs.append(torch.relu(cs))
                pad = (x.shape[2] % 2, x.shape[3] % 2)
                x = tF.avg_pool2d(x, 2, padding=pad, count_include_pad=True)
                y = tF.avg_pool2d(y, 2, padding=pad, count_include_pad=True)
        stacked = torch.stack(mcs + [torch.relu(s)], dim=0)
        return torch.prod(stacked ** self.weights.reshape(-1, 1, 1), dim=0).mean()

    def __call__(self, x, y):
        import torch
        import torch.nn.functional as tF

        loss = 1 - self._ssim_val(x, y)
        if self.mix < 1:
            pad = (self.win_size - 1) // 2
            l1 = tF.pad(torch.abs(x - y), (pad, pad, pad, pad))
            loss = self.mix * loss + (1 - self.mix) * self._blur(l1).mean()
        return loss


def run_parity(
    n_steps=500,
    n_images=40,
    batch_size=8,
    hidden=None,
    depth=2,
    seed=0,
    loss="mse",
    hr_res=64,
    device_pipe=False,
    per_step_noise=False,
    track_steps=0,
    log=print,
):
    """Train both frameworks; returns (psnr_jax, psnr_torch).

    loss="mse" | "ssim" (SSIMLoss(mix=0.8, ms=True), the reference CLI's
    canonical training loss, pssr/__main__.py:117-123 — hr_res must be
    >= 176 so 5 MS levels fit the 11-tap window).

    device_pipe=True compares the FULL stacks end to end: the JAX side
    crappifies fresh on device each step (ops/degrade.py), the torch side
    crappifies fresh on host each step (the reference _gen_pair chain,
    pssr/data.py:471-495).  Noise realizations then differ by design, so
    the delta includes sampling variance — evidence of distribution-level
    parity rather than a numerics-controlled comparison."""
    import numpy as np
    import torch
    import torch.nn.functional as tF
    from flax import nnx

    import jax
    import jax.numpy as jnp

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import MSELoss, SSIMLoss

    hidden = [16, 32] if hidden is None else hidden
    hr, lr = make_phantom_data(n_images=n_images, hr_res=hr_res, seed=seed)
    n_val = max(4, n_images // 5)
    hr_tr, lr_tr, hr_va, lr_va = hr[n_val:], lr[n_val:], hr[:n_val], lr[:n_val]

    model = ResUNet(hidden=hidden, depth=depth)
    twin = build_torch_twin(model, hidden, depth)

    if loss == "ssim":
        jax_loss = SSIMLoss(mix=0.8, ms=True)
        torch_loss = TorchSSIMLoss(mix=0.8, ms=True)
    else:
        jax_loss = MSELoss()
        torch_loss = lambda a, b: tF.mse_loss(a, b)  # noqa: E731

    # identical batch orders for both frameworks
    rng = np.random.default_rng(seed + 1)
    n_tr = len(hr_tr)
    orders = [rng.permutation(n_tr) for _ in range(n_steps * batch_size // n_tr + 2)]
    flat = np.concatenate(orders)

    lr_scale = 4
    lr_res = hr_res // lr_scale

    # per_step_noise: ONE precomputed noise sequence shared by both
    # frameworks — fresh Poisson draws every step (so neither side can
    # memorize fixed noise instances, the failure mode that made
    # fixed-LR SSIM runs measure overfitting dynamics instead of
    # numerics) while inputs stay bit-identical across frameworks.
    lr_steps = None
    if per_step_noise:
        from pssr2_tpu.ops.resize import resize_bilinear_np as _rbn

        crap_seq = Poisson()
        np.random.seed(seed + 3)
        ds_tr = np.clip(np.round(_rbn(hr_tr, lr_res, lr_res)), 0, 255).astype(np.uint8)
        lr_steps = []
        for i in range(n_steps):
            sel = flat[i * batch_size : (i + 1) * batch_size]
            batch = np.stack([crap_seq.crappify(p) for p in ds_tr[sel]])
            lr_steps.append(np.clip(np.round(batch), 0, 255).astype(np.float32))

    # ---- JAX training (the framework's real train step) ----
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
    if device_pipe:
        from pssr2_tpu.data.pipeline import make_device_gen_pair

        base = make_device_gen_pair(lr_scale, Poisson(), None, augment=False)
        train_step, _ = _build_paired_steps(
            jax_loss, False, lambda key, batch, augment: base(key, batch)
        )
    else:
        train_step, _ = _build_paired_steps(jax_loss, False, None)
    model.train()
    step = nnx.cached_partial(train_step, model, optimizer)
    key = jax.random.key(0)
    hr_u8 = np.clip(np.round(hr_tr), 0, 255).astype(np.uint8)
    track_j = []
    for i in range(n_steps):
        sel = flat[i * batch_size : (i + 1) * batch_size]
        if device_pipe:
            key, k1 = jax.random.split(key)
            batch = jnp.asarray(hr_u8[sel])
            loss_v, _, _ = step(batch, None, k1, optim.lr, batch_size, False)
        elif lr_steps is not None:
            loss_v, _, _ = step((hr_tr[sel], lr_steps[i]), None, key, optim.lr, batch_size, False)
        else:
            loss_v, _, _ = step((hr_tr[sel], lr_tr[sel]), None, key, optim.lr, batch_size, False)
        if i < track_steps:
            track_j.append(float(loss_v))
        if i % 100 == 0:
            log(f"  jax step {i}: loss {float(loss_v):.5f}")
    model.eval()
    pred_j = np.asarray(model(lr_va))
    psnr_j = _psnr(pred_j, hr_va)

    # ---- torch training (reference-style loop, same data/batches) ----
    from pssr2_tpu.ops.resize import resize_bilinear_np

    topt = torch.optim.AdamW(twin.parameters(), lr=1e-3)
    twin.train()
    hr_t, lr_t = torch.from_numpy(hr_tr), torch.from_numpy(lr_tr)
    np.random.seed(seed + 2)  # host Poisson draws (device_pipe mode)
    crap = Poisson()
    ds_hr = np.clip(np.round(resize_bilinear_np(hr_tr, lr_res, lr_res)), 0, 255).astype(np.uint8)
    track_t = []
    for i in range(n_steps):
        isel = flat[i * batch_size : (i + 1) * batch_size].copy()
        sel = torch.from_numpy(isel)
        if device_pipe:
            lr_batch = np.stack([crap.crappify(p) for p in ds_hr[isel]])
            lr_batch = torch.from_numpy(np.clip(np.round(lr_batch), 0, 255).astype(np.float32))
        elif lr_steps is not None:
            lr_batch = torch.from_numpy(lr_steps[i])
        else:
            lr_batch = lr_t[sel]
        out = twin(lr_batch)
        loss_v = torch_loss(out / 255.0, hr_t[sel] / 255.0)
        topt.zero_grad()
        loss_v.backward()
        topt.step()
        if i < track_steps:
            track_t.append(float(loss_v))
        if i % 100 == 0:
            log(f"  torch step {i}: loss {float(loss_v):.5f}")
    twin.eval()
    with torch.no_grad():
        pred_t = twin(torch.from_numpy(lr_va)).numpy()
    psnr_t = _psnr(pred_t, hr_va)

    if track_steps:
        tj, tt = np.asarray(track_j), np.asarray(track_t)
        rel = np.abs(tj - tt) / np.maximum(np.abs(tt), 1e-6)
        return psnr_j, psnr_t, {"max_rel": float(rel.max()), "mean_rel": float(rel.mean())}
    return psnr_j, psnr_t


def run_ssim_seed(seed):
    """One canonical-SSIM-row seed (the VERDICT r3 #4 power-up: >=5 seeds
    on the row that ships).  Appends a JSON line to
    train_parity_seeds.jsonl; combine with `python train_parity.py
    combine` once 5+ seeds are in."""
    import json

    pj, pt, traj = run_parity(
        seed=seed, loss="ssim", hr_res=192, n_images=96, n_steps=400,
        batch_size=16, per_step_noise=True, track_steps=50,
    )
    row = {"seed": seed, "psnr_jax": pj, "psnr_torch": pt,
           "delta_db": abs(pj - pt), "traj_max_rel": traj["max_rel"]}
    with open(os.path.join(os.path.dirname(__file__), "train_parity_seeds.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def combine_seeds():
    """Fold train_parity_seeds.jsonl into the canonical row of
    train_parity.md (keeps the MSE/full-stack rows as measured r3)."""
    import json

    path = os.path.join(os.path.dirname(__file__), "train_parity_seeds.jsonl")
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            rows[r["seed"]] = r  # last write per seed wins
    rows = [rows[k] for k in sorted(rows)]
    deltas = [r["delta_db"] for r in rows]
    mean_d, max_d = sum(deltas) / len(deltas), max(deltas)
    traj = max(r["traj_max_rel"] for r in rows)
    line = (
        f"| SSIMLoss(mix=0.8, MS), shared per-step noise (192->48), batch 16 "
        f"| {len(rows)} | {mean_d:.3f} | "
        f"{', '.join(f'{d:.3f}' for d in deltas)} | {traj:.4f} |"
    )
    md = os.path.join(os.path.dirname(__file__), "train_parity.md")
    with open(md) as f:
        text = f.read()
    out_lines = []
    for ln in text.splitlines():
        if ln.startswith("| SSIMLoss(mix=0.8, MS), shared per-step noise"):
            out_lines.append(line)
        elif ln.startswith("Budget (BASELINE.md"):
            ok = mean_d <= 0.1 and max_d <= 0.1
            out_lines.append(
                f"Budget (BASELINE.md north star): mean <= 0.1 dB on the controlled rows; "
                f"canonical row also max <= 0.1 dB "
                f"(mean {mean_d:.3f}, max {max_d:.3f}, {len(rows)} seeds).  "
                f"{'PASS' if ok else 'FAIL'}"
            )
        else:
            out_lines.append(ln)
    with open(md, "w") as f:
        f.write("\n".join(out_lines))
    print(line)
    print(f"mean {mean_d:.3f} max {max_d:.3f} over {len(rows)} seeds")
    assert mean_d <= 0.1 and max_d <= 0.1


def main():
    """Three comparisons, the controlled rows seed-averaged.

    Final-PSNR deltas after hundreds of steps amplify fp-level platform
    differences chaotically (identical library states rerun to ~0.1 dB
    spreads), so the controlled rows are averaged over 3 seeds AND paired
    with a loss-TRAJECTORY agreement metric over the first 100 steps,
    where numerics parity shows before chaos sets in."""
    import jax

    rows = []
    # MSE, the round-2 regime, 3 seeds
    mse = [run_parity(seed=s, track_steps=100) for s in (0, 1, 2)]
    rows.append(("MSE, fixed LR (64->16), batch 8", mse))
    # canonical SSIMLoss(mix=0.8, MS) at the canonical batch 16, with a
    # SHARED per-step noise sequence: fresh Poisson draws each step so
    # neither side memorizes fixed noise instances (that failure mode made
    # deltas measure overfitting dynamics), identical inputs across
    # frameworks
    ssim = [
        run_parity(
            seed=s, loss="ssim", hr_res=192, n_images=96, n_steps=400,
            batch_size=16, per_step_noise=True, track_steps=50,
        )
        for s in (0, 1)
    ]
    rows.append(("SSIMLoss(mix=0.8, MS), shared per-step noise (192->48), batch 16", ssim))
    # full stacks: on-device Poisson pipeline vs host reference chain
    full = [
        run_parity(
            seed=0, loss="ssim", hr_res=192, n_images=96, n_steps=400,
            batch_size=16, device_pipe=True, track_steps=100,
        )
    ]
    rows.append(("SSIMLoss(mix=0.8, MS), FULL stacks (device Poisson vs host Poisson)", full))

    lines = [
        "# Cross-framework training parity (round 3)",
        "",
        "Same initial weights, same batch order, AdamW(1e-3) torch defaults",
        "both sides, losses on [0,1], ResUNet(hidden=[16,32], depth=2) x4",
        f"phantom pairs.  JAX runs on {jax.default_backend()} (the production",
        "backend); the torch twin on CPU f32.  The SSIM rows use the",
        "reference CLI's canonical training loss (SSIMLoss(mix=0.8, MS),",
        "pssr/__main__.py:117-123) with the torch twin's loss implemented via",
        "the pytorch_msssim conv2d oracle (tests/test_ssim_oracles.py);",
        "step-0 losses agree to ~2e-4, certifying the loss twin itself.",
        "",
        "'traj max rel' is the max relative per-step train-loss deviation",
        "over the first 100 steps — the numerics-parity signal BEFORE",
        "chaotic trajectory divergence dominates final-PSNR deltas.",
        "",
        "| setting | seeds | mean |PSNR delta| (dB) | per-seed deltas | traj max rel |",
        "|---|---|---|---|---|",
    ]
    checks = []
    for name, runs in rows:
        deltas = [abs(pj - pt) for pj, pt, _ in runs]
        trajs = [m["max_rel"] for _, _, m in runs]
        mean_d = sum(deltas) / len(deltas)
        checks.append((name, mean_d))
        lines.append(
            f"| {name} | {len(runs)} | {mean_d:.3f} | "
            f"{', '.join(f'{d:.3f}' for d in deltas)} | {max(trajs):.4f} |"
        )
        print(lines[-1], flush=True)
    ok = all(d <= 0.1 for _, d in checks[:2])
    lines += ["", f"Budget (BASELINE.md north star): mean <= 0.1 dB on the controlled rows.  {'PASS' if ok else 'FAIL'}", ""]
    report = "\n".join(lines)
    out = os.path.join(os.path.dirname(__file__), "train_parity.md")
    with open(out, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "combine":
        combine_seeds()
    elif len(sys.argv) > 1 and sys.argv[1] == "ssim_seed":
        run_ssim_seed(int(sys.argv[2]))
    else:
        main()
