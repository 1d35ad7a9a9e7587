"""Dump the optimized HLO of the current canonical train step (round 3)
and print the definitions of the hot fusions identified by the profiler
(convert_reduce_fusion family ~7 ms/step, fusion.1864/1865 tail+recon-dx,
f32[80,...] loss pyramid maps) for graph-level analysis.

Writes experiments/mxu_probe20.hlo (full text).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


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

    lowered = pure_step.lower(state, hr_u8, key, optim.lr)
    compiled = lowered.compile()
    text = compiled.as_text()
    path = os.path.join(HERE, "mxu_probe20.hlo")
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote {path}: {len(text)} bytes", flush=True)


if __name__ == "__main__":
    main()
