"""Probe45: fused conv+BN-stat layer kernel (ops/pallas/convchain), fwd
formulation, standalone at the canonical C=64 encoder shapes.

Round-3 floor table (results_r3.md): enc/dec convs measured 16.8 ms vs a
~13 ms floor, with 9.7 ms of separate BN stat/apply f32[C] fusions at
~2.5x byte floor; the C<=64 stages fill <=50% of the MXU's output lanes
by layout.  The kernel moves activations to (N, H, C, W) — W=128 on
lanes (exact), C=64 on sublanes — turning the conv into (64, 576) @
(576, 128) dots at full lane occupancy with the BN apply+ReLU as
prologue and the next BN's (sum, sum^2) as an in-VMEM epilogue.

Measured here (interleaved medians, fetch-synced):
  xla    — the model's current formulation on NHWC: affine+relu, conv3x3
           via the TPU conv emitter, stats as the "axes" dual reduce.
  kern   — the Pallas layer on (N, H, C, W).
  kern2  — two chained Pallas layers (the ResBlock depth-1 chain shape)
           vs two chained XLA layers (xla2): amortizes boundary effects.
  tpose  — NHWC <-> NHCW transpose round trip alone (chain boundary
           cost if the model keeps NHWC elsewhere).

Shapes: batch 16, 128x128 spatial, 64 channels, bf16 (canonical ResUNet
x4 encoder level 0 / decoder tail).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp

    from pssr2_tpu.ops.pallas import convchain

    print(f"devices: {jax.devices()}", flush=True)
    N, H, W, C = 16, 128, 128, 64
    rng = np.random.default_rng(0)
    x_nhwc = jnp.asarray(rng.normal(0, 1, (N, H, W, C)), jnp.bfloat16)
    x_nhcw = jnp.transpose(x_nhwc, (0, 1, 3, 2))
    kernel = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.bfloat16)
    kernel2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.bfloat16)
    wmat = convchain.kernel_matrix(kernel)
    wmat2 = convchain.kernel_matrix(kernel2)
    bias = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
    ab = jnp.asarray(np.stack([rng.uniform(0.5, 1.5, C), rng.normal(0, 0.2, C)]), jnp.float32)

    def xla_layer(x, k, relu_in):
        if relu_in:
            a = ab[0].reshape(1, 1, 1, C).astype(x.dtype)
            b = ab[1].reshape(1, 1, 1, C).astype(x.dtype)
            x = jnp.maximum(x * a + b, 0)
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        y = (y + bias.astype(x.dtype)).astype(x.dtype)
        yf = y.astype(jnp.float32)
        # STATS_FWD="axes": dual reduce over the raw NHWC tensor
        return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))

    @jax.jit
    def xla1(x):
        return xla_layer(x, kernel, False)

    @jax.jit
    def xla2(x):
        y, s1, s2 = xla_layer(x, kernel, False)
        return xla_layer(y, kernel2, True)

    @jax.jit
    def kern1(x):
        return convchain.fused_conv_layer(x, wmat, bias, relu_in=False)

    @jax.jit
    def kern2(x):
        y, s1, s2 = convchain.fused_conv_layer(x, wmat, bias, relu_in=False)
        return convchain.fused_conv_layer(y, wmat2, bias, ab, relu_in=True)

    @jax.jit
    def tpose(x):
        xt = jnp.transpose(x, (0, 1, 3, 2))
        return jnp.transpose(xt + jnp.bfloat16(1), (0, 1, 3, 2))

    def sync(out):
        leaf = out[0] if isinstance(out, tuple) else out
        return float(jnp.ravel(leaf)[0])

    runs = [
        ("xla1", xla1, x_nhwc),
        ("kern1", kern1, x_nhcw),
        ("xla2", xla2, x_nhwc),
        ("kern2", kern2, x_nhcw),
        ("tpose", tpose, x_nhwc),
    ]
    # compile + numerics cross-check (kern vs xla on the transposed twin)
    outs = {}
    for name, fn, arg in runs:
        outs[name] = fn(arg)
        sync(outs[name])
        print(f"compiled {name}", flush=True)
    ya = np.asarray(outs["xla2"][0], np.float32)
    yk = np.asarray(jnp.transpose(outs["kern2"][0], (0, 1, 3, 2)), np.float32)
    dev = np.abs(ya - yk).max() / max(np.abs(ya).max(), 1e-6)
    s1d = float(np.abs(np.asarray(outs["xla2"][1]) - np.asarray(outs["kern2"][1])).max())
    print(f"chain-2 rel dev: {dev:.2e}  s1 absdev {s1d:.3e}", flush=True)

    trials = {name: [] for name, *_ in runs}
    for t in range(7):
        for name, fn, arg in runs:
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(arg)
            sync(out)
            trials[name].append(round((time.perf_counter() - t0) / 20 * 1e3, 4))
        print(json.dumps({"trial": t, **{n: trials[n][-1] for n in trials}}), flush=True)

    results = {
        name: {"median_ms": sorted(v)[len(v) // 2], "trials": v} for name, v in trials.items()
    }
    results["rel_dev_chain2"] = float(dev)
    print(json.dumps(results), flush=True)
    with open(os.path.join(HERE, "mxu_probe45.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
