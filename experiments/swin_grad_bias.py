"""Localize the systematic fused-SwinIR training bias (gate r4: -0.117 dB
endpoint cost, seeds 0/1/2; exact-gelu leg exonerated the polynomial).

Same weights, same K batches: per-parameter-leaf gradient deltas between
the fused whole-block VJP path (swinblock MODE=auto) and the XLA
autodiff twin (MODE=off).  For each leaf: bias = ||mean_k delta|| vs
noise = ||std_k delta||/sqrt(K), plus the relative scale vs ||grad||.
A leaf family with bias >> noise and non-trivial relative scale is the
carrier of the systematic divergence.

Run (TPU): python experiments/swin_grad_bias.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
K = 8
B = 8


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pssr2_tpu.models import SwinIR
    from pssr2_tpu.ops.pallas import swinblock
    from pssr2_tpu.util import SSIMLoss

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    batches = [
        (
            jnp.asarray(rng.random((B, 1, 128, 128)).astype(np.float32) * 255),
            jnp.asarray(rng.random((B, 1, 512, 512)).astype(np.float32) * 255),
        )
        for _ in range(K)
    ]
    loss_fn = SSIMLoss(mix=0.8, ms=True)

    grads = {}
    for mode in ("auto", "off"):
        swinblock.MODE = mode
        model = SwinIR(image_size=128, dtype=jnp.bfloat16, drop_path_rate=0.0)
        model.train()
        graphdef, params, rest = nnx.split(model, nnx.Param, ...)

        def loss(params_, lr, hr):
            m = nnx.merge(graphdef, params_, rest)
            pred = m(lr)
            return loss_fn(pred / 255.0, hr / 255.0)

        gfn = jax.jit(jax.grad(loss))
        outs = []
        for lr, hr in batches:
            g = gfn(params, lr, hr)
            outs.append(jax.tree.map(lambda a: np.asarray(a, np.float64), g))
        grads[mode] = outs
        print(f"{mode}: {len(outs)} grad sets", flush=True)

    rows = []
    leaves_a = [jax.tree_util.tree_leaves_with_path(g) for g in grads["auto"]]
    leaves_o = [jax.tree_util.tree_leaves_with_path(g) for g in grads["off"]]
    n_leaves = len(leaves_a[0])
    for i in range(n_leaves):
        name = str(leaves_a[0][i][0])
        deltas = np.stack(
            [leaves_a[k][i][1] - leaves_o[k][i][1] for k in range(K)]
        )  # (K, ...)
        gmag = float(np.sqrt(np.mean(np.stack([leaves_o[k][i][1] for k in range(K)]) ** 2)))
        bias = deltas.mean(axis=0)
        noise = deltas.std(axis=0) / np.sqrt(K)
        bias_n = float(np.sqrt(np.mean(bias**2)))
        noise_n = float(np.sqrt(np.mean(noise**2))) + 1e-30
        rows.append(
            {
                "leaf": name,
                "bias_rms": bias_n,
                "noise_rms": noise_n,
                "t": round(bias_n / noise_n, 2),
                "bias_over_grad": round(bias_n / (gmag + 1e-30), 5),
            }
        )
    rows.sort(key=lambda r: -r["t"])
    for r in rows[:25]:
        print(json.dumps(r), flush=True)
    with open(os.path.join(HERE, "swin_grad_bias.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
