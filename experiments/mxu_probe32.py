"""MXU probe 32: SwinIR inference reconciliation — place the fused-path
batch crossover (batch 1/4/8 fused vs unfused) and split the 7.7 ms
closure-vs-split-form jit delta at batch 16 (tunnel arg marshalling vs
device time)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.models import SwinIR
    from pssr2_tpu.ops.pallas import swinblock as sb

    def sync(v):
        return float(jnp.ravel(v)[0])

    def bench(fn, trials=6, warmup=3):
        for _ in range(warmup):
            sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    model = SwinIR(dtype=jnp.bfloat16)
    model.eval()
    graphdef, state = nnx.split(model)
    results = []

    def run(name, batch, min_grid, closure):
        sb.MIN_GRID_ROWS = min_grid
        sb._fused_fn.cache_clear()
        x = jnp.asarray(rng.integers(0, 255, (batch, 1, 128, 128)).astype(np.float32))
        if closure:
            fwd = jax.jit(lambda t: model(t))
            fn = lambda: fwd(x)
        else:
            fwd = jax.jit(lambda s, t: nnx.merge(graphdef, s)(t))
            fn = lambda: fwd(state, x)
        try:
            ms = bench(fn)
            row = {"variant": name, "batch": batch, "ms": round(ms, 2),
                   "tiles_s": round(batch * 1e3 / ms, 1)}
        except Exception as e:
            row = {"variant": name, "error": str(e)[:160]}
        print(json.dumps(row), flush=True)
        results.append(row)

    run("b1_unfused(gated)", 1, 64, False)
    run("b4_fused", 4, 1, False)
    run("b4_unfused", 4, 10**6, False)
    run("b8_fused", 8, 1, False)
    run("b16_split", 16, 64, False)
    run("b16_closure", 16, 64, True)
    sb.MIN_GRID_ROWS = 64

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe32.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
