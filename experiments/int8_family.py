"""int8 (W8A8) vs bf16 batched tiled inference for the atrous family
(ResUNetA canonical x4 128->512 batch 16).  Companion to int8_infer.py
(plain ResUNet numbers); same 8-steps-per-sync protocol."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
B = 16


def _time(fn, steps=8, trials=5):
    import jax.numpy as jnp

    def sync(v):
        return float(jnp.ravel(v)[0])

    for _ in range(3):
        sync(fn())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pssr2_tpu.models import ResUNetA
    from pssr2_tpu.quant import quantize_resunet

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    lr_np = rng.random((B, 1, 128, 128)).astype(np.float32) * 255
    lr = jnp.asarray(lr_np)

    results = {}
    model = ResUNetA(dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    model.eval()
    graphdef, state = nnx.split(model)
    fwd = jax.jit(lambda s, x: nnx.merge(graphdef, s)(x))
    t = _time(lambda: fwd(state, lr))
    results["resuneta_bf16"] = {"ms": round(t * 1e3, 2), "tiles_per_sec": round(B / t, 1)}
    print("resuneta_bf16", json.dumps(results["resuneta_bf16"]), flush=True)

    q = quantize_resunet(model, [lr_np[:4]])
    tq = _time(lambda: q(lr))
    results["resuneta_int8"] = {
        "ms": round(tq * 1e3, 2),
        "tiles_per_sec": round(B / tq, 1),
        "speedup_vs_bf16": round(t / tq, 3),
    }
    print("resuneta_int8", json.dumps(results["resuneta_int8"]), flush=True)

    ref = np.asarray(fwd(state, lr), np.float32)
    out = np.asarray(q(lr), np.float32)
    rel = float(np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9))
    results["resuneta_rel_l2_int8_vs_bf16"] = round(rel, 5)
    print("rel_l2", rel, flush=True)

    from pssr2_tpu.models import RDResUNet
    from pssr2_tpu.quant import quantize_rdresunet

    model = RDResUNet(dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    model.eval()
    graphdef, state = nnx.split(model)
    fwd = jax.jit(lambda s, x: nnx.merge(graphdef, s)(x))
    t = _time(lambda: fwd(state, lr))
    results["rdresunet_bf16"] = {"ms": round(t * 1e3, 2), "tiles_per_sec": round(B / t, 1)}
    print("rdresunet_bf16", json.dumps(results["rdresunet_bf16"]), flush=True)

    q = quantize_rdresunet(model, [lr_np[:4]])
    tq = _time(lambda: q(lr))
    results["rdresunet_int8_hybrid"] = {
        "ms": round(tq * 1e3, 2),
        "tiles_per_sec": round(B / tq, 1),
        "speedup_vs_bf16": round(t / tq, 3),
    }
    print("rdresunet_int8_hybrid", json.dumps(results["rdresunet_int8_hybrid"]), flush=True)

    ref = np.asarray(fwd(state, lr), np.float32)
    out = np.asarray(q(lr), np.float32)
    rel = float(np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9))
    results["rdresunet_rel_l2_int8_vs_bf16"] = round(rel, 5)
    print("rd rel_l2", rel, flush=True)

    with open(os.path.join(HERE, "int8_family.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
