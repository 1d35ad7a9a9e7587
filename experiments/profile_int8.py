"""Profile the int8 (W8A8) ResUNet serving forward vs its bf16 twin and
attribute where the measured 1.32x (vs the 2x pure-matmul MXU int8 rate,
int8_probe2) goes: int8 conv time vs quant/dequant glue vs relayouts vs
the non-conv remainder the quantization cannot touch (VERDICT r4 #3).

Captures two xplane traces (experiments/profile_int8_out/{bf16,int8});
analyze with:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python experiments/analyze_xplane4.py experiments/profile_int8_out/<x>.xplane.pb
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "profile_int8_out")
B = 16


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.quant import quantize_resunet

    def sync(v):
        return float(jnp.ravel(v)[0])

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    lr_np = rng.random((B, 1, 128, 128)).astype(np.float32) * 255
    lr = jnp.asarray(lr_np)

    model = ResUNet(dtype=jnp.bfloat16)
    model.eval()
    graphdef, state = nnx.split(model)
    fwd = jax.jit(lambda s, x: nnx.merge(graphdef, s)(x))
    q = quantize_resunet(model, [lr_np[:4]])

    runs = {"bf16": lambda: fwd(state, lr), "int8": lambda: q(lr)}
    times = {}
    for name, run in runs.items():
        for _ in range(4):
            sync(run())
        t0 = time.perf_counter()
        for _ in range(8):
            out = run()
        sync(out)
        times[name] = round((time.perf_counter() - t0) / 8 * 1e3, 2)
        print(f"{name}: {times[name]} ms", flush=True)

        d = os.path.join(OUT, name)
        os.makedirs(d, exist_ok=True)
        jax.profiler.start_trace(d)
        for _ in range(3):
            out = run()
        sync(out)
        jax.profiler.stop_trace()
        xp = sorted(glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True))
        print(f"  trace: {xp[-1] if xp else 'MISSING'}", flush=True)

    with open(os.path.join(OUT, "times.json"), "w") as f:
        json.dump(times, f, indent=1)


if __name__ == "__main__":
    main()
