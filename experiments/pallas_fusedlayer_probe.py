"""Probe: the Pallas fused ResBlock layer (ops/pallas/fusedlayer.py) vs
the XLA sequence, at canonical enc1 shapes (16,128,128,64)x64.

Measures (fwd only):
1. 3-layer chain, XLA reference (affine+relu -> conv -> stats per layer)
2. 3-layer chain, Pallas fused_layer
3. sandwich composition: XLA conv -> fused_layer -> XLA conv, checked for
   relayout copies in the optimized HLO (the failure mode that killed the
   chanstats kernel, mxu_probe16).
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = []
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import pssr2_tpu.ops.pallas.fusedlayer as fl

    def sync(v):
        return float(jnp.ravel(v)[0])

    def op_time(fn, x, k_lo=4, k_hi=32, reps=3):
        def runner(k):
            @jax.jit
            def run(x):
                def body(i, acc):
                    out = fn(x + (i * 1e-9).astype(x.dtype))
                    return acc + jnp.sum(out.astype(jnp.float32))

                return jax.lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        lo, hi = runner(k_lo), runner(k_hi)
        sync(lo(x)), sync(hi(x))
        ts = {}
        for n, r in (("lo", lo), ("hi", hi)):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(r(x))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts["hi"] - ts["lo"]) / (k_hi - k_lo)

    def record(name, seconds):
        entry = {"name": name, "ms": round(seconds * 1e3, 3)}
        RESULTS.append(entry)
        print(json.dumps(entry), flush=True)
        with open(os.path.join(HERE, "pallas_fusedlayer_probe.json"), "w") as f:
            json.dump(RESULTS, f, indent=1)

    print(f"devices: {jax.devices()}", flush=True)
    B, H, W, C = 16, 128, 128, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, C), np.float32) - 0.3, dtype=jnp.bfloat16)
    ws = [jnp.asarray(rng.random((3, 3, C, C), np.float32) * 0.1 - 0.05) for _ in range(3)]
    a = jnp.asarray(rng.random(C, np.float32) * 0.2 + 0.9)
    b = jnp.asarray(rng.random(C, np.float32) * 0.1)

    def chain_ref(x):
        h = x
        for w in ws:
            h, sums = fl.fused_layer_reference(h, w, a, b, relu_in=True)
        return jnp.sum(sums)[None] + jnp.sum(h.astype(jnp.float32))

    def chain_pallas(x):
        h = x
        for w in ws:
            h, sums = fl.fused_layer(h, w, a, b, relu_in=True)
        return jnp.sum(sums)[None] + jnp.sum(h.astype(jnp.float32))

    # numeric sanity on-device
    r1 = float(jax.jit(chain_ref)(x)[0])
    r2 = float(jax.jit(chain_pallas)(x)[0])
    print(f"chain ref={r1:.1f} pallas={r2:.1f} rel={abs(r1 - r2) / abs(r1):.2e}", flush=True)

    record("3-layer chain, XLA", op_time(chain_ref, x))
    record("3-layer chain, pallas fused", op_time(chain_pallas, x))

    # sandwich: XLA conv -> fused -> XLA conv; count relayout copies in HLO
    def sandwich(x):
        h = lax.conv_general_dilated(
            x, ws[0].astype(x.dtype), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        h, sums = fl.fused_layer(h, ws[1], a, b, relu_in=True)
        h = lax.conv_general_dilated(
            h, ws[2].astype(x.dtype), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(h.astype(jnp.float32)) + jnp.sum(sums)

    compiled = jax.jit(sandwich).lower(x).compile()
    text = compiled.as_text()
    big_copies = [
        ln.strip()[:140]
        for ln in text.splitlines()
        if re.search(r"= \w+\[16,128,128,64\]", ln) and ".copy(" in ln.replace("copy(", ".copy(")
    ]
    n_copy = len(re.findall(r" copy\(", text))
    print(f"sandwich HLO: {n_copy} copies total", flush=True)
    for ln in big_copies[:6]:
        print("  ", ln, flush=True)
    record("sandwich fwd (conv-fused-conv)", op_time(lambda v: sandwich(v)[None], x))

    def sandwich_ref(x):
        h = lax.conv_general_dilated(
            x, ws[0].astype(x.dtype), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        h, sums = fl.fused_layer_reference(h, ws[1], a, b, relu_in=True)
        h = lax.conv_general_dilated(
            h, ws[2].astype(x.dtype), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(h.astype(jnp.float32)) + jnp.sum(sums)

    record("sandwich fwd, XLA ref", op_time(lambda v: sandwich_ref(v)[None], x))


if __name__ == "__main__":
    main()
