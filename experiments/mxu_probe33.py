"""MXU probe 33: XLA-einsum SwinIR inference at batch 1/4/8/16 (all
Pallas attention paths off) — places the kernel-vs-XLA crossover for the
batch gates (MIN_BATCH / MIN_GRID_ROWS)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.models import SwinIR
    from pssr2_tpu.ops.pallas import swinblock as sb, winattn as wa

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
    fwd = jax.jit(lambda s, t: nnx.merge(graphdef, s)(t))
    results = []

    sb.MODE = "off"
    wa.MODE = "off"
    for batch in (1, 4, 8, 16):
        x = jnp.asarray(rng.integers(0, 255, (batch, 1, 128, 128)).astype(np.float32))
        try:
            ms = bench(lambda: fwd(state, x))
            row = {"variant": "xla_einsum", "batch": batch, "ms": round(ms, 2),
                   "tiles_s": round(batch * 1e3 / ms, 1)}
        except Exception as e:
            row = {"variant": "xla_einsum", "batch": batch, "error": str(e)[:160]}
        print(json.dumps(row), flush=True)
        results.append(row)
    # gated auto path at batch 1 and 4 (should now pick XLA)
    sb.MODE = "auto"
    wa.MODE = "auto"
    for batch in (1, 4):
        x = jnp.asarray(rng.integers(0, 255, (batch, 1, 128, 128)).astype(np.float32))
        ms = bench(lambda: fwd(state, x))
        row = {"variant": "auto_gated", "batch": batch, "ms": round(ms, 2),
               "tiles_s": round(batch * 1e3 / ms, 1)}
        print(json.dumps(row), flush=True)
        results.append(row)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe33.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
