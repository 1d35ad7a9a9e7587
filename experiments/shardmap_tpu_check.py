"""Hardware check: the shard_map DP step with REAL Pallas kernels inside
(fused SSIM loss for ResUNet; whole-block fwd+VJP kernels for SwinIR;
block-tail LN+MLP fwd+VJP kernels for RDResUNet) on
a 1-device TPU mesh — CPU tests run the kernels in interpret mode, so
this is the proof that pallas_call compiles and executes inside a
shard_map body on device.  Prints one JSON line per model."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import RDResUNet, ResUNet, SwinIR
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.parallel.mesh import batch_sharding, data_mesh
    from pssr2_tpu.train import _build_shard_map_steps

    from pssr2_tpu.util import SSIMLoss

    print(f"devices: {jax.devices()}", flush=True)
    mesh = data_mesh(1)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)

    def gen_pair(key, batch, augment, key_block=None):
        return base(key, batch, key_block=key_block)

    rng = np.random.default_rng(0)
    for name, model, B, res in (
        ("ResUNet", ResUNet(dtype=jnp.bfloat16), 16, 512),
        ("SwinIR", SwinIR(image_size=128, dtype=jnp.bfloat16), 16, 512),
        ("RDResUNet", RDResUNet(dtype=jnp.bfloat16), 16, 512),
    ):
        model.train()
        optim = AdamW(1e-3)
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        step, _ = _build_shard_map_steps(
            SSIMLoss(mix=0.8, ms=True), False, gen_pair, mesh, B
        )
        batch = jax.device_put(
            rng.integers(0, 255, (B, 1, res, res)).astype(np.uint8),
            batch_sharding(mesh),
        )
        loss, _, _ = step(model, optimizer, batch, None, jax.random.key(0), optim.lr, B, False)
        out = {"model": name, "shard_map_loss": float(loss), "finite": bool(np.isfinite(float(loss)))}
        print(json.dumps(out), flush=True)
        assert out["finite"], out


if __name__ == "__main__":
    main()
