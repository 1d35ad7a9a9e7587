"""MXU probe 26: dissect the fused 2-D window-attention kernel at the
SwinIR batch-16 bench shape (16,128,128,288), 6 heads, ws=8.

Variants (all steady-state via a dependent fori_loop, 16 iterations =
one model's worth of layers per timed unit):
  full      — the shipped kernel (winattn._pallas_window_attention_2d)
  rows2     — 2 window-rows per grid step (half the grid)
  nosoftmax — softmax replaced by scale (isolates VPU softmax cost)
  nodots    — out = v slice (isolates IO + in-VMEM shuffle floor)
  noshuffle — dots on the raw (ws, ws*k) rows as if they were windows
              (wrong math; isolates the in-kernel transpose cost)
"""
import functools, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl

    HEADS, D, WS, K = 6, 16, 8, 16
    C = HEADS * D
    N = WS * WS
    SCALE = D ** -0.5

    def sync(v): return float(jnp.ravel(v)[0])
    def bench(fn, trials=5):
        for _ in range(2): sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best / 16 * 1e3  # per layer-equivalent

    print(f"devices: {jax.devices()}", flush=True)

    def make_kernel(variant):
        def kern(qkv_ref, bias_ref, out_ref):
            c = C
            qkv = qkv_ref[0]
            if variant != "noshuffle":
                qkv = qkv.reshape(WS, K, WS, 3 * c).transpose(1, 0, 2, 3).reshape(K, N, 3 * c)
            else:
                qkv = qkv.reshape(K, N, 3 * c)  # wrong grouping, same shapes
            outs = []
            for h in range(HEADS):
                q = qkv[:, :, h * D : (h + 1) * D]
                kk = qkv[:, :, c + h * D : c + (h + 1) * D]
                v = qkv[:, :, 2 * c + h * D : 2 * c + (h + 1) * D]
                if variant == "nodots":
                    outs.append(v.astype(out_ref.dtype))
                    continue
                s = jax.lax.dot_general(q, kk, (((2,), (2,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                s = s * SCALE + bias_ref[h][None]
                if variant == "nosoftmax":
                    p = (s * 0.01).astype(qkv.dtype)
                else:
                    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
                o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                outs.append(o.astype(out_ref.dtype))
            out = jnp.concatenate(outs, axis=-1)
            if variant != "noshuffle":
                out = out.reshape(K, WS, WS, c).transpose(1, 0, 2, 3).reshape(WS, WS * K, c)
            else:
                out = out.reshape(WS, WS * K, c)
            out_ref[0] = out
        return kern

    def make_kernel_rows2(rows):
        # rows window-rows per grid step: block (1, ws*rows, 128, 3C)
        def kern(qkv_ref, bias_ref, out_ref):
            c = C
            qkv = qkv_ref[0]  # (ws*rows, 128, 3C)
            qkv = qkv.reshape(rows, WS, K, WS, 3 * c).transpose(0, 2, 1, 3, 4).reshape(
                rows * K, N, 3 * c)
            outs = []
            for h in range(HEADS):
                q = qkv[:, :, h * D : (h + 1) * D]
                kk = qkv[:, :, c + h * D : c + (h + 1) * D]
                v = qkv[:, :, 2 * c + h * D : 2 * c + (h + 1) * D]
                s = jax.lax.dot_general(q, kk, (((2,), (2,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                s = s * SCALE + bias_ref[h][None]
                p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
                o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                outs.append(o.astype(out_ref.dtype))
            out = jnp.concatenate(outs, axis=-1)
            out = out.reshape(rows, K, WS, WS, c).transpose(0, 2, 1, 3, 4).reshape(
                rows * WS, WS * K, c)
            out_ref[0] = out
        return kern

    B, H, W = 16, 128, 128
    rng = np.random.default_rng(0)
    qkv0 = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)).astype(np.float32) * 0.1,
                       dtype=jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((HEADS, N, N)).astype(np.float32) * 0.01)

    def run_variant(name, kern, rows=1):
        blk_h = WS * rows
        call = pl.pallas_call(
            kern,
            grid=(B, H // blk_h, 1),
            in_specs=[
                pl.BlockSpec((1, blk_h, W, 3 * C), lambda b, i, j: (b, i, j, 0)),
                pl.BlockSpec((HEADS, N, N), lambda b, i, j: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, blk_h, W, C), lambda b, i, j: (b, i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        )

        @jax.jit
        def loop(qkv):
            def body(i, x):
                o = call(x, bias)
                return jnp.concatenate([o, o, o], axis=-1)
            return jax.lax.fori_loop(0, 16, body, qkv)

        ms = bench(lambda: loop(qkv0))
        row = {"variant": name, "ms_per_layer": round(ms, 4)}
        print(json.dumps(row), flush=True)
        return row

    results = []
    results.append(run_variant("full", make_kernel("full")))
    results.append(run_variant("nosoftmax", make_kernel("nosoftmax")))
    results.append(run_variant("nodots", make_kernel("nodots")))
    results.append(run_variant("noshuffle", make_kernel("noshuffle")))
    results.append(run_variant("rows2", make_kernel_rows2(2), rows=2))
    results.append(run_variant("rows4", make_kernel_rows2(4), rows=4))

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe26.json"), "w") as f:
        json.dump(results, f, indent=1)

if __name__ == "__main__":
    main()
