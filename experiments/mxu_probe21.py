"""MXU probe round 21 (round 3): full-step A/B of the levers identified by
the fresh exclusive-time profile (experiments/analyze_xplane2.py):

1. SSIM blur precision: "highest" (f32, 6 bf16 passes — baseline) vs
   "high" (bf16x3) vs "default" (1 pass).  ssim.py:68-69 dots cost
   ~2.6 ms/step at highest.  Also records the loss VALUE under each
   setting on the same batch (numerics delta).
2. Z_BARRIER on/off/post: the barrier bracketing the tail z contraction
   forces a {3,0,2,1}<->{2,1,3,0} layout flip pair on the 144-ch z tensor
   (~0.85 ms of copies in the capture); the graph has changed since
   probe14 picked "pre".
3. Micro: M-vs-N lane-padding asymmetry for the recon dx contraction
   (output 262144x65 vs 65x262144) — decides whether a transposed dx
   formulation can beat the conv emitter's 3.19 ms.
"""
import itertools
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss
    from pssr2_tpu.ops import ssim as ssim_mod
    from pssr2_tpu.ops import smallconv

    def sync(v): return float(jnp.ravel(v)[0])
    def single_dispatch(fn, n_steps=8, trials=4):
        for _ in range(3): sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(n_steps): out = fn()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best

    print(f"devices: {jax.devices()}", flush=True)
    results = []
    B = 16
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    optim = AdamW(1e-3)

    def build_step():
        model = ResUNet(dtype=jnp.bfloat16)
        model.train()
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        step, _ = _build_paired_steps(SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch))
        return nnx.cached_partial(step, model, optimizer)

    # ---- 1+2: full-step A/B over blur precision x z-barrier ----
    for prec, barrier in [
        ("highest", ("pre", True)),   # baseline (shipped)
        ("high", ("pre", True)),
        ("default", ("pre", True)),
        ("highest", ("pre", False)),
        ("highest", ("post", True)),
        ("high", ("pre", False)),
    ]:
        ssim_mod.BLUR_PRECISION = prec
        smallconv.Z_BARRIER_POS, smallconv.Z_BARRIER = barrier
        step = build_step()
        loss0 = float(step(hr_u8, None, key, optim.lr, B, False)[0])
        ms = single_dispatch(lambda: step(hr_u8, None, key, optim.lr, B, False)[0]) * 1e3
        row = {"blur_precision": prec, "z_barrier": barrier, "step_ms": round(ms, 3), "loss": loss0}
        print(json.dumps(row), flush=True)
        results.append(row)
    ssim_mod.BLUR_PRECISION = "highest"
    smallconv.Z_BARRIER_POS, smallconv.Z_BARRIER = "pre", True

    # ---- 3: dx orientation micro ----
    M, K, N = 16 * 128 * 128, 1024, 65
    gy = jnp.asarray(np.random.default_rng(1).standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(2).standard_normal((K, N)), jnp.bfloat16)
    gyT = gy.T
    wT = w.T

    @jax.jit
    def mn(a, b):  # output (M, 65): N half-lane
        return a @ b

    @jax.jit
    def nm(bt, at):  # output (65, M): M=65 in sublane dim
        return bt @ at

    for name, fn, args in [
        ("dx_out_M%dxN%d" % (M, N), mn, (gy, w)),
        ("dx_out_N%dxM%d" % (N, M), nm, (wT, gyT)),
    ]:
        ms = single_dispatch(lambda fn=fn, args=args: fn(*args), n_steps=30) * 1e3
        gf = 2 * M * K * N / 1e9
        row = {"micro": name, "ms": round(ms, 4), "tflops": round(gf / ms, 1)}
        print(json.dumps(row), flush=True)
        results.append(row)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe21.json"), "w") as f:
        json.dump(results, f, indent=1)

if __name__ == "__main__":
    main()
