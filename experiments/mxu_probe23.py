"""MXU probe 23: window-attention kernel formulations at bench shapes
(SwinIR x4 batch-16: W=4096 windows, n=64 tokens, 6 heads, d=16).

v0: shipped per-window-loop Pallas kernel (measured 2x SLOWER than XLA in
    the full model — op-issue-bound: ~49k tiny dots per layer)
v1: batched dot_general per (chunk, head) + whole-block softmax
v2: v1 with G=16
xla: the reference einsum formulation
"""
import functools
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from pssr2_tpu.ops.pallas import winattn

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
    W, n, heads, d = 4096, 64, 6, 16
    c = heads * d
    scale = d ** -0.5
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((W, n, 3 * c)) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32)

    results = []

    # ---- v0: shipped kernel ----
    f0 = jax.jit(lambda a, b: winattn._pallas_window_attention(a, b, None, scale, heads))
    want = np.asarray(f0(qkv, bias), np.float32)
    results.append({"v": "v0 per-window loop", "ms": round(bench(lambda: f0(qkv, bias)), 3)})
    print(results[-1], flush=True)

    # ---- v1/v2: batched dots + block softmax ----
    def make_batched(g):
        def kernel(qkv_ref, bias_ref, out_ref):
            qkv_b = qkv_ref[...]
            for h in range(heads):
                q = qkv_b[:, :, h * d : (h + 1) * d]
                k = qkv_b[:, :, c + h * d : c + (h + 1) * d]
                v = qkv_b[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
                s = jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                )  # (g, n, n)
                s = s * scale + bias_ref[h][None]
                p = jax.nn.softmax(s, axis=-1).astype(qkv_b.dtype)
                o = jax.lax.dot_general(
                    p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
                )
                out_ref[:, :, h * d : (h + 1) * d] = o.astype(out_ref.dtype)

        return jax.jit(lambda a, b: pl.pallas_call(
            kernel,
            grid=(W // g,),
            in_specs=[
                pl.BlockSpec((g, n, 3 * c), lambda i: (i, 0, 0)),
                pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((W, n, c), a.dtype),
        )(a, b))

    for g in (8, 16, 32):
        try:
            fb = make_batched(g)
            got = np.asarray(fb(qkv, bias), np.float32)
            err = float(np.abs(got - want).max())
            results.append({"v": f"batched G={g}", "ms": round(bench(lambda: fb(qkv, bias)), 3), "maxerr": err})
        except Exception as e:
            results.append({"v": f"batched G={g}", "error": f"{type(e).__name__}: {e}"[:200]})
        print(results[-1], flush=True)

    # ---- XLA reference ----
    fx = jax.jit(lambda a, b: winattn.reference_window_attention(a, b, None, scale, heads))
    results.append({"v": "xla einsum", "ms": round(bench(lambda: fx(qkv, bias)), 3)})
    print(results[-1], flush=True)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe23.json"), "w") as f:
        json.dump(results, f, indent=1)

if __name__ == "__main__":
    main()
