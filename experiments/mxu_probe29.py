"""MXU probe 29: ablation attribution of the fused swin-block kernel at
the batch-16 bf16 inference shape (wrong outputs; time only)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from pssr2_tpu.models import SwinIR
    from pssr2_tpu.ops.pallas import swinblock

    def sync(v): return float(jnp.ravel(v)[0])
    def bench(fn, trials=6):
        for _ in range(3): sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    print(f"devices: {jax.devices()}", flush=True)
    results = []
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (16, 1, 128, 128)).astype(np.float32)
    )
    model = SwinIR(dtype=jnp.bfloat16)
    model.eval()
    swinblock.MODE = "auto"
    for abl in ["none", "no_mlp", "no_attn", "no_qkv_attn", "relu", "no_ln"]:
        swinblock.ABLATE = abl
        swinblock._fused_fn.cache_clear()
        try:
            fwd = jax.jit(lambda t: model(t))
            ms = bench(lambda: fwd(x))
            row = {"ablate": abl, "ms": round(ms, 3)}
        except Exception as e:
            row = {"ablate": abl, "error": str(e)[:160]}
        print(json.dumps(row), flush=True)
        results.append(row)
    swinblock.ABLATE = "none"

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe29.json"), "w") as f:
        json.dump(results, f, indent=1)

if __name__ == "__main__":
    main()
