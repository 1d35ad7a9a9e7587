"""MXU probe round 22: validate the lane-fold lever and the bf16-loss lever.

Premise (from the HLO layouts in mxu_probe20.hlo): bf16 NHWC tensors with
C=64 are physically padded to 128 lanes in HBM -> every op on the
enc1/dec4 @128^2 family moves 2x the bytes.  Folding TWO batch samples
into the channel dim (B=16,C=64 -> B=8,C=128) with block-diagonal conv
weights computes the identical math at full lane occupancy.

Micros:
1. relu on [16,128,128,64] vs [8,128,128,128] (pure padding effect)
2. conv3x3 64->64 @128^2 B16 vs block-diag 128->128 @128^2 B8, fwd and
   fwd+dw, with a relu epilogue
3. 2-layer conv chain + per-channel stat sums (the ResBlock shape) both ways
4. full canonical train step with SSIMLoss(dtype=bf16) vs f32 loss
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax import lax
    from flax import nnx
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    def sync(v): return float(jnp.ravel(v)[0])
    def bench(fn, n_steps=20, trials=4):
        for _ in range(3): sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(n_steps): out = fn()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best * 1e3

    print(f"devices: {jax.devices()}", flush=True)
    results = []
    rng = np.random.default_rng(0)

    x64 = jnp.asarray(rng.standard_normal((16, 128, 128, 64)), jnp.bfloat16)
    x128 = jnp.asarray(rng.standard_normal((8, 128, 128, 128)), jnp.bfloat16)
    w64 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    wbd = jnp.zeros((3, 3, 128, 128), jnp.bfloat16)
    wbd = wbd.at[:, :, :64, :64].set(w64).at[:, :, 64:, 64:].set(w64)

    relu64 = jax.jit(lambda x: jax.nn.relu(x))
    relu128 = jax.jit(lambda x: jax.nn.relu(x))
    results.append({"micro": "relu 16x128x128x64", "ms": round(bench(lambda: relu64(x64)), 4)})
    print(results[-1], flush=True)
    results.append({"micro": "relu 8x128x128x128", "ms": round(bench(lambda: relu128(x128)), 4)})
    print(results[-1], flush=True)

    def conv(x, w):
        return jax.nn.relu(lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))

    c64 = jax.jit(lambda x: conv(x, w64))
    c128 = jax.jit(lambda x: conv(x, wbd))
    results.append({"micro": "conv64+relu B16", "ms": round(bench(lambda: c64(x64)), 4)})
    print(results[-1], flush=True)
    results.append({"micro": "conv128bd+relu B8", "ms": round(bench(lambda: c128(x128)), 4)})
    print(results[-1], flush=True)

    # fwd+dw: grads wrt weights of a 2-conv chain with stat sums (ResBlock-ish)
    def chain(x, w1, w2):
        y = conv(conv(x, w1), w2)
        y2 = y.reshape(-1, y.shape[-1]).astype(jnp.float32)
        return y, y2.sum(0), (y2 * y2).sum(0)

    def loss64(w1, w2):
        y, s0, s1 = chain(x64, w1, w2)
        return (y.astype(jnp.float32).mean() + s0.mean() * 1e-6 + s1.mean() * 1e-7)

    def loss128(w1, w2):
        y, s0, s1 = chain(x128, w1, w2)
        return (y.astype(jnp.float32).mean() + s0.mean() * 1e-6 + s1.mean() * 1e-7)

    g64 = jax.jit(jax.grad(loss64, argnums=(0, 1)))
    g128 = jax.jit(jax.grad(loss128, argnums=(0, 1)))
    w64b = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    wbdb = jnp.zeros((3, 3, 128, 128), jnp.bfloat16)
    wbdb = wbdb.at[:, :, :64, :64].set(w64b).at[:, :, 64:, 64:].set(w64b)
    results.append({"micro": "2conv+stats fwd+dw B16 C64", "ms": round(bench(lambda: g64(w64, w64b)[0]), 4)})
    print(results[-1], flush=True)
    results.append({"micro": "2conv+stats fwd+dw B8 C128bd", "ms": round(bench(lambda: g128(wbd, wbdb)[0]), 4)})
    print(results[-1], flush=True)

    # ---- full step with bf16 loss ----
    B = 16
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(rng.integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    optim = AdamW(1e-3)
    for name, loss_fn in [
        ("step f32 loss", SSIMLoss(mix=0.8, ms=True)),
        ("step bf16 loss", SSIMLoss(mix=0.8, ms=True, dtype=jnp.bfloat16)),
    ]:
        model = ResUNet(dtype=jnp.bfloat16)
        model.train()
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        step, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
        step = nnx.cached_partial(step, model, optimizer)
        loss0 = float(step(hr_u8, None, key, optim.lr, B, False)[0])
        ms = bench(lambda: step(hr_u8, None, key, optim.lr, B, False)[0], n_steps=8)
        results.append({"name": name, "step_ms": round(ms, 3), "loss": loss0})
        print(results[-1], flush=True)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe22.json"), "w") as f:
        json.dump(results, f, indent=1)

if __name__ == "__main__":
    main()
