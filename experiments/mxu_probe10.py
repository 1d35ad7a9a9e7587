"""MXU probe round 10: find the real SSIM-composition penalty.

Probe 4's "windowed-L1 only" case was SSIMLoss(mix=0.0, ms=True), which
still builds the full MS-SSIM graph (0.0 * x is not reliably DCE'd), so
"any blur is slow" was a false lead; probe 8 showed a bare composed blur is
free.  Bisect what _ssim_parts adds, and diff the optimized HLO (conv op
count + temp memory) between the MSE and SSIM executables to test the
rematerialization theory.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = []
PEAK = 197e12
HERE = os.path.dirname(os.path.abspath(__file__))


def record(name, seconds, flops=0):
    entry = {
        "name": name,
        "ms": round(seconds * 1e3, 3),
        "mxu_pct": round(100 * flops / seconds / PEAK, 1) if flops else None,
    }
    RESULTS.append(entry)
    print(json.dumps(entry), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    def sync(v):
        return float(jnp.ravel(v)[0])

    def op_time(fn, x, k_lo=2, k_hi=10, reps=3):
        def runner(k):
            @jax.jit
            def run(x):
                def body(i, acc):
                    out = fn(x + (i * 1e-9).astype(x.dtype))
                    return acc + jnp.sum(out.astype(jnp.float32))

                return jax.lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        lo, hi = runner(k_lo), runner(k_hi)
        sync(lo(x)), sync(hi(x))
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
    STEP_FLOPS = 3 * 63.3e9 * B

    import pssr2_tpu.ops.ssim  # noqa: F401 — package __init__ shadows the name

    ssim_mod = sys.modules["pssr2_tpu.ops.ssim"]
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.util import SSIMLoss

    lr = jnp.asarray(np.random.default_rng(0).random((B, 1, 128, 128), np.float32) * 255)
    hr = jnp.asarray(np.random.default_rng(1).random((B, 1, 512, 512), np.float32) * 255)

    model = ResUNet(dtype=bf16)
    model.eval()
    gd, st = nnx.split(model)

    def tree_sum(tree):
        return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(tree))

    def fwdbwd(loss_fn):
        def f(x):
            def loss(st):
                return loss_fn(nnx.merge(gd, st)(x))

            return tree_sum(jax.grad(loss)(st))[None]

        return f

    # ---- HLO diff: MSE vs full SSIM executables -------------------------
    full_loss = SSIMLoss(mix=0.8, ms=True)

    def hlo_stats(tag, loss_fn):
        def f(st, x):
            def loss(st):
                return loss_fn(nnx.merge(gd, st)(x))

            return tree_sum(jax.grad(loss)(st))

        compiled = jax.jit(f).lower(st, lr).compile()
        text = compiled.as_text()
        with open(os.path.join(HERE, f"mxu_probe10_{tag}.hlo"), "w") as fh:
            fh.write(text)
        n_conv = len(re.findall(r" convolution\(", text))
        n_dot = len(re.findall(r" dot\(", text))
        n_fusion = len(re.findall(r" fusion\(", text))
        mem = compiled.memory_analysis()
        stats = {
            "tag": tag,
            "convolutions": n_conv,
            "dots": n_dot,
            "fusions": n_fusion,
            "temp_MB": round(getattr(mem, "temp_size_in_bytes", 0) / 1e6, 1),
            "argument_MB": round(getattr(mem, "argument_size_in_bytes", 0) / 1e6, 1),
            "output_MB": round(getattr(mem, "output_size_in_bytes", 0) / 1e6, 1),
        }
        print(json.dumps(stats), flush=True)
        RESULTS.append(stats)
        return compiled

    if not os.environ.get("SKIP_HLO"):
        hlo_stats("mse", lambda out: jnp.mean((out / 255.0 - hr / 255.0) ** 2))
        hlo_stats("ssim", lambda out: full_loss(out / 255.0, hr / 255.0))

    # ---- timing bisection ------------------------------------------------
    y = hr / 255.0

    def blur11(t):
        return ssim_mod._blur(t, 11, 1.5)

    def loss_mse(out):
        return jnp.mean((out / 255.0 - y) ** 2)

    def loss_bare_blur(out):
        return jnp.mean(blur11(jnp.abs(out / 255.0 - y)))

    def loss_concat5(out):
        x = out / 255.0
        stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=0)
        return jnp.mean(blur11(stacked))

    def loss_ssim_nodiv(out):
        # _ssim_parts with the two divisions replaced by multiplications:
        # same blur/concat/moment structure, no division in fwd or bwd.
        x = out / 255.0
        c1, c2 = (0.01) ** 2, (0.03) ** 2
        stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=0)
        blurred = blur11(stacked)
        mu1, mu2, xx_b, yy_b, xy_b = jnp.split(blurred, 5, axis=0)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1, s2, s12 = xx_b - mu1_sq, yy_b - mu2_sq, xy_b - mu1_mu2
        cs_map = (2 * s12 + c2) * (s1 + s2 + c2)
        ssim_map = (2 * mu1_mu2 + c1) * (mu1_sq + mu2_sq + c1) * cs_map
        return jnp.mean(ssim_map)

    def loss_ssim_single(out):
        return 1 - ssim_mod.ssim(out / 255.0, y, data_range=1)

    def loss_l1_windowed_real(out):
        # the actual _l1_windowed path: zero-pad 5 then blur (band 522x512)
        l1 = jnp.abs(out / 255.0 - y)
        l1 = jnp.pad(l1, ((0, 0), (0, 0), (5, 5), (5, 5)))
        return jnp.mean(blur11(l1))

    cases = [
        ("mse", loss_mse),
        ("bare blur (no pad)", loss_bare_blur),
        ("concat5+blur", loss_concat5),
        ("ssim nodiv", loss_ssim_nodiv),
        ("ssim single-scale", loss_ssim_single),
        ("l1 windowed (pad+blur)", loss_l1_windowed_real),
        ("full mix ms-ssim", lambda out: full_loss(out / 255.0, y)),
    ]
    for name, loss_fn in cases:
        record(f"fwd+dw {name}", op_time(fwdbwd(loss_fn), lr), flops=STEP_FLOPS)

    with open(os.path.join(HERE, "mxu_probe10.json"), "w") as f2:
        json.dump(RESULTS, f2, indent=1)


if __name__ == "__main__":
    main()
