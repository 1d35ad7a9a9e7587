"""Profile the SwinIR batch-16 bf16 eval forward WITH the fused window
attention (round 3) — where do the remaining ~110 ms go?

Writes experiments/profile_swinir4/ (xplane); parse with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python
experiments/analyze_xplane2.py experiments/profile_swinir4/plugins/profile/*/\
*.xplane.pb --steps 3
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "profile_swinir4")


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.models import SwinIR

    def sync(v):
        return float(jnp.ravel(v)[0])

    print(f"devices: {jax.devices()}", flush=True)
    model = SwinIR(image_size=128, dtype=jnp.bfloat16)
    model.eval()
    graphdef, state = nnx.split(model)
    forward = jax.jit(lambda s, x: nnx.merge(graphdef, s)(x))
    lr = jnp.asarray(np.random.default_rng(0).random((16, 1, 128, 128)).astype(np.float32) * 255)

    for _ in range(3):
        sync(forward(state, lr))
    os.makedirs(OUT, exist_ok=True)
    jax.profiler.start_trace(OUT)
    for _ in range(3):
        out = forward(state, lr)
    sync(out)
    jax.profiler.stop_trace()
    print("trace written", flush=True)


if __name__ == "__main__":
    main()
