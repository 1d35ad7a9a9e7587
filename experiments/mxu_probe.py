"""MXU efficiency probe: where do the 22.4 ms (fwd) / 67 ms (step) go?

Times individual pieces of the canonical ResUNet x4 config (batch 16,
512->128, bf16 compute) on the real chip and prints per-piece achieved
vs roofline, so kernel work targets the real bottleneck instead of a guess.

Harness note: a single dispatch through the axon tunnel costs ~3 ms of
fixed overhead with ~1 ms jitter, which drowns sub-ms ops.  Each op is
therefore run inside a jitted fori_loop at two loop lengths and timed by
the SLOPE (t_hi - t_lo) / (k_hi - k_lo) with a large delta-K, which
cancels dispatch and any per-program constant work.

Run:  python experiments/mxu_probe.py   (axon TPU; ~20-40 min incl. compiles)
Output: one JSON line per measurement to stdout + experiments/mxu_probe.json
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []

PEAK_TFLOPS_BF16 = 197.0  # v5e MXU peak
PEAK_HBM_GBS = 819.0  # v5e HBM bandwidth


def record(name, seconds, flops=0, bytes_moved=0):
    entry = {
        "name": name,
        "ms": round(seconds * 1e3, 3),
        "gflop": round(flops / 1e9, 2),
        "mxu_pct": round(100 * flops / seconds / (PEAK_TFLOPS_BF16 * 1e12), 1) if flops else None,
        "hbm_pct": round(100 * bytes_moved / seconds / (PEAK_HBM_GBS * 1e9), 1) if bytes_moved else None,
    }
    RESULTS.append(entry)
    print(json.dumps(entry), flush=True)


def conv_flops(B, H, W, Cin, Cout, k=3):
    return 2 * B * H * W * Cout * (k * k * Cin)


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    def sync(v):
        return float(jnp.ravel(v)[0])

    def op_time(fn, x, k_lo=4, k_hi=260, reps=3):
        """Per-iteration seconds of fn(x)->array via the two-length slope."""

        def runner(k):
            @jax.jit
            def run(x):
                def body(i, acc):
                    out = fn(x + (i * 1e-9).astype(x.dtype))
                    return acc + jnp.ravel(out)[0].astype(jnp.float32)

                return jax.lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        lo, hi = runner(k_lo), runner(k_hi)
        sync(lo(x)), sync(hi(x))  # compile
        times = {}
        for name, r in (("lo", lo), ("hi", hi)):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(r(x))
                best = min(best, time.perf_counter() - t0)
            times[name] = best
        return (times["hi"] - times["lo"]) / (k_hi - k_lo)

    print(f"devices: {jax.devices()}", flush=True)
    B = 16
    bf16 = jnp.bfloat16
    key = jax.random.key(0)

    # ---- calibration: big matmul + copy ----------------------------------
    a = jax.random.normal(key, (8192, 8192), bf16)
    record("calib matmul 8192^3 bf16", op_time(lambda a: a @ a, a, 2, 34), flops=2 * 8192**3)

    big = jax.random.normal(key, (64, 1024, 1024), bf16)  # 128 MB
    record(
        "calib elemwise 128MB bf16",
        op_time(lambda x: x * 1.0001 + 0.5, big),
        bytes_moved=2 * big.size * 2,
    )

    # ---- conv shapes of the canonical model ------------------------------
    from jax import lax

    def make_conv(w):
        def f(x):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(bf16)

        return f

    shapes = [
        ("first 1->64 @128", 128, 1, 64),
        ("enc1 64->64 @128", 128, 64, 64),
        ("enc2 128->128 @64", 64, 128, 128),
        ("enc3 256->256 @32", 32, 256, 256),
        ("enc4 512->512 @16", 16, 512, 512),
        ("enc5 1024->1024 @8", 8, 1024, 1024),
        ("dec4 96->64 @128", 128, 96, 64),
        ("recon 65->1024 @128", 128, 65, 1024),
        ("final 64->1 @512", 512, 64, 1),
    ]
    for name, hw, cin, cout in shapes:
        x = jax.random.normal(key, (B, hw, hw, cin), bf16)
        w = jax.random.normal(key, (3, 3, cin, cout), bf16)
        klo, khi = (4, 260) if hw * hw * cin * cout < 2**29 else (3, 35)
        t = op_time(make_conv(w), x, klo, khi)
        record(f"conv {name}", t, flops=conv_flops(B, hw, hw, cin, cout),
               bytes_moved=2 * (B * hw * hw * (cin + cout)))

    # final conv via the exact tap-matmul reformulation:
    # Z = X @ W^T over channels per tap (MXU, N=9), then 9 shifted adds (VPU)
    def make_final_tap(w):
        def f(x):
            Bs, H, W, C = x.shape
            wt = w[..., 0].reshape(9, C).T
            z = jnp.dot(x.reshape(-1, C), wt, preferred_element_type=jnp.float32)
            z = z.reshape(Bs, H, W, 9)
            zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = sum(zp[:, u : u + H, v : v + W, 3 * u + v] for u in range(3) for v in range(3))
            return out[..., None].astype(bf16)

        return f

    x = jax.random.normal(key, (B, 512, 512, 64), bf16)
    w = jax.random.normal(key, (3, 3, 64, 1), bf16)
    record("final tap-matmul 64->1 @512", op_time(make_final_tap(w), x, 3, 67),
           flops=conv_flops(B, 512, 512, 64, 1), bytes_moved=2 * x.size)

    # taps-leading variant (z kept (9, BHW) to dodge lane padding)
    def make_final_tapT(w):
        def f(x):
            Bs, H, W, C = x.shape
            wt = w[..., 0].reshape(9, C)  # (9, C)
            z = jnp.dot(wt, x.reshape(-1, C).T, preferred_element_type=jnp.float32)
            z = z.reshape(9, Bs, H, W)
            zp = jnp.pad(z, ((0, 0), (0, 0), (1, 1), (1, 1)))
            out = sum(zp[3 * u + v, :, u : u + H, v : v + W] for u in range(3) for v in range(3))
            return out[..., None].astype(bf16)

        return f

    record("final tapT-matmul 64->1 @512", op_time(make_final_tapT(w), x, 3, 67),
           flops=conv_flops(B, 512, 512, 64, 1), bytes_moved=2 * x.size)

    # ---- non-conv ops -----------------------------------------------------
    from pssr2_tpu.ops.shuffle import pixel_shuffle

    xs = jax.random.normal(key, (B, 128, 128, 1024), bf16)
    record(
        "pixel_shuffle 128^2x1024 ->512^2x64",
        op_time(lambda x: pixel_shuffle(x, 4, channels_last=True), xs, 3, 67),
        bytes_moved=2 * xs.size * 2,
    )

    xp = jax.random.normal(key, (B, 128, 128, 64), bf16)
    record(
        "max_pool 2x2 @128x64",
        op_time(lambda x: nnx.max_pool(x, window_shape=(2, 2), strides=(2, 2)), xp),
        bytes_moved=2 * xp.size + 2 * xp.size // 4,
    )

    # functional train-mode batchnorm (stats over B,H,W) at stage-1 shape
    def bn_train(x):
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(0, 1, 2), keepdims=True)
        return ((x - mean) * jax.lax.rsqrt(var + 1e-5)).astype(bf16)

    record("bn train-stats @128x64", op_time(bn_train, xp), bytes_moved=3 * 2 * xp.size)

    relu = lambda x: jnp.maximum(x, 0)  # noqa: E731
    record("relu @128x64", op_time(relu, xp), bytes_moved=2 * 2 * xp.size)

    # ---- resblock stage (conv stack + BN + relu), eval mode ---------------
    from pssr2_tpu.models.blocks import ResBlock

    fl = conv_flops(B, 128, 128, 64, 64) * 4 + conv_flops(B, 128, 128, 64, 64, 1)
    for norm in (True, False):
        blk = ResBlock(64, 64, depth=3, norm=norm, rngs=nnx.Rngs(0), dtype=bf16)
        blk.eval()
        gd, st = nnx.split(blk)
        x = jax.random.normal(key, (B, 128, 128, 64), bf16)

        def fwd(x, gd=gd, st=st):
            return nnx.merge(gd, st)(x)

        def fwdbwd(x, fwd=fwd):
            return jax.grad(lambda x: jnp.sum(fwd(x).astype(jnp.float32)))(x)

        record(f"resblock64 fwd eval norm={norm}", op_time(fwd, x, 3, 67), flops=fl)
        record(f"resblock64 fwd+dx eval norm={norm}", op_time(fwdbwd, x, 3, 35), flops=3 * fl)

    # ---- full model (eval mode: no BN stat mutation under grad) ----------
    from pssr2_tpu.models import ResUNet

    MODEL_FLOPS = 63.3e9 * B  # analytic fwd count, canonical config
    lr = jnp.asarray(np.random.default_rng(0).random((B, 1, 128, 128), np.float32) * 255)
    hr = jnp.asarray(np.random.default_rng(1).random((B, 1, 512, 512), np.float32) * 255)

    model = ResUNet(dtype=bf16)
    model.eval()
    gd, st = nnx.split(model)
    record("model fwd eval", op_time(lambda x: nnx.merge(gd, st)(x), lr, 3, 35), flops=MODEL_FLOPS)

    def fwdbwd(x):
        return jax.grad(lambda x: jnp.mean((nnx.merge(gd, st)(x) - hr) ** 2))(x)

    record("model fwd+dx eval (MSE)", op_time(fwdbwd, lr, 3, 19), flops=3 * MODEL_FLOPS)

    def fwdbwd_w(x):
        def loss(st):
            return jnp.mean((nnx.merge(gd, st)(x) - hr) ** 2)

        return jax.tree.leaves(jax.grad(loss)(st))[0]

    record("model fwd+dw eval (MSE)", op_time(fwdbwd_w, lr, 3, 19), flops=3 * MODEL_FLOPS)

    # loss alone
    from pssr2_tpu.util import SSIMLoss

    loss_fn = SSIMLoss(mix=0.8, ms=True)
    hh = jnp.asarray(np.random.default_rng(2).random((B, 1, 512, 512), np.float32) * 255)
    record("ms-ssim loss fwd", op_time(lambda a: loss_fn(a / 255.0, hr / 255.0), hh, 3, 67))
    record(
        "ms-ssim loss fwd+bwd",
        op_time(lambda a: jax.grad(lambda a: loss_fn(a / 255.0, hr / 255.0))(a), hh, 3, 35),
    )

    # degrade pipeline alone
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair

    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))

    def degrade(x):
        h, l = base(key, x.astype(jnp.uint8))
        return h

    record("degrade pipeline (aug+resize+poisson)", op_time(degrade, hr_u8.astype(jnp.float32), 3, 67))

    # full train step (single-dispatch; ~3ms dispatch overhead included,
    # negligible at this size)
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps

    model2 = ResUNet(dtype=bf16)
    model2.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model2, optim.tx, wrt=nnx.Param)
    fused_step, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
    fused_step = nnx.cached_partial(fused_step, model2, optimizer)

    def run_fused():
        loss, _, _ = fused_step(hr_u8, None, key, optim.lr, B, False)
        return loss

    for _ in range(3):
        sync(run_fused())
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(8):
            out = run_fused()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / 8)
    record("full train step (fused, single-dispatch)", best, flops=3 * MODEL_FLOPS)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe.json"), "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
