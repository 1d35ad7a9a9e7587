"""MXU probe 30: A/B the round-3 swinblock knobs (fast gelu, no-max
softmax, transposed heads, ROWS=2) at the batch-16 bf16 inference shape."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from pssr2_tpu.models import SwinIR
    from pssr2_tpu.ops.pallas import swinblock as sb

    def sync(v):
        return float(jnp.ravel(v)[0])

    def bench(fn, trials=6):
        for _ in range(3):
            sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    print(f"devices: {jax.devices()}", flush=True)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (16, 1, 128, 128)).astype(np.float32)
    )
    model = SwinIR(dtype=jnp.bfloat16)
    model.eval()
    sb.MODE = "auto"

    # (name, fast_gelu, nomax, transposed, rows)
    variants = [
        ("baseline", False, False, False, 1),
        ("fast_gelu", "auto", False, False, 1),
        ("nomax", False, True, False, 1),
        ("transposed", False, False, True, 1),
        ("transposed_rows2", False, False, True, 2),
        ("all_rows1", "auto", True, True, 1),
        ("all_rows2", "auto", True, True, 2),
    ]
    results = []
    ref = None
    for name, fg, nm, th, rows in variants:
        sb.FAST_GELU, sb.NOMAX_SOFTMAX, sb.TRANSPOSED_HEADS, sb.ROWS = fg, nm, th, rows
        sb._fused_fn.cache_clear()
        try:
            fwd = jax.jit(lambda t: model(t))
            out = np.asarray(fwd(x), np.float32)
            if ref is None:
                ref = out
            dev = float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6))
            ms = bench(lambda: fwd(x))
            row = {"variant": name, "ms": round(ms, 3),
                   "tiles_s": round(16 / (ms / 1e3), 1), "rel_dev": f"{dev:.1e}"}
        except Exception as e:
            row = {"variant": name, "error": str(e)[:200]}
        print(json.dumps(row), flush=True)
        results.append(row)
    sb.FAST_GELU, sb.NOMAX_SOFTMAX, sb.TRANSPOSED_HEADS, sb.ROWS = "auto", False, False, 1

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe30.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
