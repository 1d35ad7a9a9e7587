"""Systematic-gradient-bias gate for the convchain fused conv+BN-stat
training path (ops/pallas/convchain.py, default-ON on ResUNet).

Why this probe is the high-power certification for this family: the
endpoint convergence gate (quality_fused.py resunet) measures fp-reorder
chaos on this task — the unfused legs' own cross-seed endpoint spread is
0.73 dB and same-seed fused-vs-unfused deltas reach 1.1 dB with an
n.s. mean (+0.33 +- 0.41 sem, quality_fused_resunet.json) — so a
0.05 dB systematic effect is unresolvable there at any feasible seed
count.  A kernel-math BUG, however, produces a *directional* gradient
bias that is detectable deterministically: the r4 SwinIR roll-space bug
showed t = bias/noise ~ 100 with bias_over_grad ~ 0.045 on its carrier
leaves (experiments/swin_grad_bias.json), while clean leaves sit at
t ~ 1 and bias_over_grad <= 6e-4.  Same method here: same weights, same
K batches; per-parameter-leaf gradient deltas between convchain
MODE="auto" and the XLA-autodiff twin (MODE="off"); for each leaf
bias = ||mean_k delta||, noise = ||std_k delta||/sqrt(K).

Self-calibrating criterion (first run taught us why): on this ReLU+BN
CNN the fp-noise FLOOR is itself large — the fused-vs-XLA per-batch
gradient deltas measure ~0.47 of grad norm with t ~ 1.1 on EVERY leaf
uniformly, i.e. ~11% gradient decorrelation with NO directional
component.  bf16 rounding flips ReLU masks at zero crossings (finite
grad jumps, unlike smooth-GELU SwinIR where the floor is ~1e-4) and
train-mode BN feeds activation rounding back through the batch stats,
so an absolute bias_over_grad threshold does not transfer across
architectures.  The probe therefore measures its own NULL: gradients of
the SAME XLA program on a batch-PERMUTED input — identical math (batch
reductions reorder), different fp summation order, zero extra compiles —
and asserts:

  1. worst t (= ||mean_k delta|| / (||std_k delta||/sqrt(K))) <= 10:
     a kernel-math bug is DIRECTIONAL (r4 SwinIR roll bug: t ~ 100;
     clean: t ~ 1) while reorder noise is batch-random.
  2. worst bias_over_grad(fused vs XLA) <= 3x worst bias_over_grad of
     the null: the kernel's reorder may not exceed the architecture's
     own fp-chaos floor by more than a small factor.

tests/test_quality_gates.py re-checks the artifact.

Run (TPU): python experiments/convchain_grad_bias.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
K = 8
B = 8
T_BUDGET = 10.0  # r4 bug signature ~100; clean ~1
NULL_FACTOR = 3.0  # fused reorder may not exceed 3x the XLA-reorder floor


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    jax.config.update(
        "jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.ops.pallas import convchain
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
    calls = []
    orig = convchain.fused_conv_layer
    convchain.fused_conv_layer = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        for mode in ("auto", "off"):
            convchain.MODE = mode
            model = ResUNet(dtype=jnp.bfloat16)
            model.train()

            # nnx.jit/nnx.grad handle the train-mode BN BatchStat mutation
            # (plain jax.jit + closure-captured state raises
            # TraceContextError — unlike the BN-free SwinIR probe this
            # adapts).  A FRESH nnx.jit per mode forces a re-trace so the
            # module-level MODE flag is re-read.  BN running-stat drift
            # across the K batches does not enter the per-batch gradient
            # (train-mode BN normalizes by the current batch's stats).
            def _loss(m, lr, hr):
                pred = m(lr)
                return loss_fn(pred / 255.0, hr / 255.0)

            gfn = nnx.jit(nnx.grad(_loss))
            outs = []
            for lr, hr in batches:
                g = gfn(model, lr, hr)
                outs.append(jax.tree.map(lambda a: np.asarray(a, np.float64), g))
            grads[mode] = outs
            print(f"{mode}: {len(outs)} grad sets (kernel traces: {len(calls)})", flush=True)
            if mode == "off":
                # NULL: same program, batch-permuted inputs — identical
                # math (param grads aggregate over the batch), different
                # fp reduction order.  Measures the architecture's own
                # reorder-noise floor with zero extra compiles.
                perm = np.roll(np.arange(B), 1)
                outs_p = []
                for lr, hr in batches:
                    g = gfn(model, lr[perm], hr[perm])
                    outs_p.append(jax.tree.map(lambda a: np.asarray(a, np.float64), g))
                grads["off-perm"] = outs_p
                print(f"off-perm: {len(outs_p)} null grad sets", flush=True)
    finally:
        convchain.fused_conv_layer = orig
        convchain.MODE = "auto"
    assert calls, "fused path never engaged — probe is vacuous"

    def delta_rows(test_key, ref_key):
        leaves_t = [jax.tree_util.tree_leaves_with_path(g) for g in grads[test_key]]
        leaves_r = [jax.tree_util.tree_leaves_with_path(g) for g in grads[ref_key]]
        rows = []
        for i in range(len(leaves_t[0])):
            name = jax.tree_util.keystr(leaves_t[0][i][0])
            deltas = np.stack([leaves_t[k][i][1] - leaves_r[k][i][1] for k in range(K)])
            gmag = float(
                np.sqrt(np.mean(np.stack([leaves_r[k][i][1] for k in range(K)]) ** 2))
            )
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
                    "bias_over_grad": round(bias_n / (gmag + 1e-30), 6),
                }
            )
        rows.sort(key=lambda r: -r["bias_over_grad"])
        return rows

    fused_rows = delta_rows("auto", "off")
    null_rows = delta_rows("off-perm", "off")
    for tag, rows in (("fused", fused_rows), ("null", null_rows)):
        for r in rows[:4]:
            print(tag, json.dumps(r), flush=True)
    worst = fused_rows[0]["bias_over_grad"]
    worst_null = null_rows[0]["bias_over_grad"]
    worst_t = max(r["t"] for r in fused_rows)
    out = {
        "protocol": f"K={K} batches x B={B}, ResUNet bf16 train-mode, full-model grad, "
        "convchain auto vs off; null = same XLA program on a batch-permuted input "
        "(see module docstring)",
        "t_budget": T_BUDGET,
        "null_factor": NULL_FACTOR,
        "worst_t": worst_t,
        "worst_bias_over_grad": worst,
        "worst_null_bias_over_grad": worst_null,
        "leaves": fused_rows,
        "null_leaves": null_rows,
    }
    with open(os.path.join(HERE, "convchain_grad_bias.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {
                "worst_t": worst_t,
                "worst_bias_over_grad": worst,
                "worst_null_bias_over_grad": worst_null,
            }
        ),
        flush=True,
    )
    assert worst_t <= T_BUDGET, (
        f"DIRECTIONAL gradient bias: worst t {worst_t} exceeds {T_BUDGET} "
        f"(r4 bug signature ~100, clean ~1)"
    )
    assert worst <= NULL_FACTOR * worst_null, (
        f"fused reorder scale {worst} exceeds {NULL_FACTOR}x the XLA-reorder "
        f"null floor {worst_null}"
    )


if __name__ == "__main__":
    main()
