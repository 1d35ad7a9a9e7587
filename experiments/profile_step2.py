"""Capture BOTH the optimized HLO text and a device trace of the SAME
compiled canonical train step (one process, one compile), so
analyze_attrib.py can map profiled op names to source lines exactly.

Env: PROFILE_TAG (default "r3") names the outputs; PROFILE_FOLD=1 forces
models.resunet.FOLD_LANES for the lane-folded variant.

Writes experiments/step_<tag>.hlo + a fresh xplane under profile_out/.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "profile_out")


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    tag = os.environ.get("PROFILE_TAG", "r3")
    if os.environ.get("PROFILE_FOLD") == "1":
        from pssr2_tpu.models import resunet

        resunet.FOLD_LANES = True

    print(f"devices: {jax.devices()}", flush=True)
    B = 16
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8)
    )
    model = ResUNet(dtype=jnp.bfloat16)
    model.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
    step, _ = _build_paired_steps(
        SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch)
    )

    graphdef, state = nnx.split((model, optimizer))

    @jax.jit
    def pure_step(state, hr_u8, key, lr):
        m, o = nnx.merge(graphdef, state)
        out = step(m, o, hr_u8, None, key, lr, B, False)
        _, new_state = nnx.split((m, o))
        return out[0], new_state

    print("compiling...", flush=True)
    compiled = pure_step.lower(state, hr_u8, key, optim.lr).compile()
    hlo_path = os.path.join(HERE, f"step_{tag}.hlo")
    with open(hlo_path, "w") as f:
        f.write(compiled.as_text())
    print(f"wrote {hlo_path}", flush=True)

    def sync(v):
        return float(jnp.ravel(v)[0])

    out = None
    for _ in range(3):
        loss, state = compiled(state, hr_u8, key, optim.lr)
        sync(loss)
    os.makedirs(OUT, exist_ok=True)
    jax.profiler.start_trace(OUT)
    for _ in range(3):
        loss, state = compiled(state, hr_u8, key, optim.lr)
    sync(loss)
    jax.profiler.stop_trace()
    xplanes = sorted(glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True))
    print("xplanes:", xplanes, flush=True)


if __name__ == "__main__":
    main()
