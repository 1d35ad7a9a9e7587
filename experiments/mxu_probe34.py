"""MXU probe 34: clean idle-device SwinIR inference numbers (the
swinir_bench_r3/probe32/probe33 runs overlapped on the tunnel — their
batch-1 rows disagree by 40%).  Measures the SHIPPING gated path at
batch 1 and 16, interleaved twice to detect drift, with both the
8-steps-per-sync protocol (bench.py `_time_steps`, what round-2's 117.6
t/s batch-1 pin used) and the 1-step-per-sync protocol (probe33)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.models import SwinIR

    def sync(v):
        return float(jnp.ravel(v)[0])

    def bench1(fn, trials=6, warmup=3):
        """1 step per sync (probe33 protocol): includes one tunnel fetch."""
        for _ in range(warmup):
            sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            sync(fn())
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    def bench8(fn, trials=3, warmup=3):
        """8 dispatched steps per sync (bench.py protocol): fetch amortized."""
        for _ in range(warmup):
            sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(8):
                out = fn()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 8)
        return best * 1e3

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    model = SwinIR(image_size=128, dtype=jnp.bfloat16)
    model.eval()
    graphdef, state = nnx.split(model)
    fwd = jax.jit(lambda s, t: nnx.merge(graphdef, s)(t))

    xs = {
        b: jnp.asarray(rng.integers(0, 255, (b, 1, 128, 128)).astype(np.float32))
        for b in (1, 16)
    }
    results = []
    for rep in (1, 2):  # interleave to catch drift/contention
        for b in (1, 16):
            x = xs[b]
            ms1 = bench1(lambda: fwd(state, x))
            ms8 = bench8(lambda: fwd(state, x))
            row = {"rep": rep, "batch": b,
                   "ms_1step_sync": round(ms1, 2), "tiles_s_1step": round(b * 1e3 / ms1, 1),
                   "ms_8step_sync": round(ms8, 2), "tiles_s_8step": round(b * 1e3 / ms8, 1)}
            print(json.dumps(row), flush=True)
            results.append(row)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe34.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
