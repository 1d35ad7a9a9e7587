"""MXU probe 28: fused swin-block kernel variants at the batch-16 bf16
inference shape — head batching, deferred softmax norm, strip height."""
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

    y_ref = None
    variants = [
        ("loop-heads r1", dict(BATCHED_HEADS=False, DEFER_NORM=False, ROWS=1)),
        ("batched r1", dict(BATCHED_HEADS=True, DEFER_NORM=False, ROWS=1)),
        ("batched+defer r1", dict(BATCHED_HEADS=True, DEFER_NORM=True, ROWS=1)),
        ("batched+defer r2", dict(BATCHED_HEADS=True, DEFER_NORM=True, ROWS=2)),
        ("batched+defer r4", dict(BATCHED_HEADS=True, DEFER_NORM=True, ROWS=4)),
    ]
    swinblock.MODE = "auto"
    for name, knobs in variants:
        for k, v in knobs.items():
            setattr(swinblock, k, v)
        swinblock._fused_fn.cache_clear()
        try:
            fwd = jax.jit(lambda t: model(t))
            y0 = np.asarray(fwd(x), np.float32)
            if y_ref is None:
                y_ref = y0
            ms = bench(lambda: fwd(x))
            row = {"what": name, "ms": round(ms, 3),
                   "tiles_per_sec": round(16e3 / ms, 1),
                   "max_dev_vs_first": float(np.abs(y0 - y_ref).max())}
        except Exception as e:  # Mosaic compile failures
            row = {"what": name, "error": str(e)[:200]}
        print(json.dumps(row), flush=True)
        results.append(row)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe28.json"), "w") as f:
        json.dump(results, f, indent=1)

if __name__ == "__main__":
    main()
