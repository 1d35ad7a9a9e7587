"""MXU probe 27: whole-block fused SwinIR chain (ops/pallas/swinblock)
vs the per-op path at the batch-16 bf16 inference bench shape."""
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

    vals = {}
    for mode in ["off", "auto"]:
        swinblock.MODE = mode
        fwd = jax.jit(lambda t: model(t))
        y0 = fwd(x)
        vals[mode] = np.asarray(y0, np.float32)
        ms = bench(lambda: fwd(x))
        row = {"what": f"SwinIR b16 bf16 infer mode={mode}", "ms": round(ms, 3),
               "tiles_per_sec": round(16e3 / ms, 1)}
        print(json.dumps(row), flush=True)
        results.append(row)

    d = np.abs(vals["auto"] - vals["off"]).max()
    row = {"what": "value agreement", "max_abs_diff": float(d),
           "out_mag": float(np.abs(vals["off"]).max())}
    print(json.dumps(row), flush=True)
    results.append(row)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe27.json"), "w") as f:
        json.dump(results, f, indent=1)

if __name__ == "__main__":
    main()
