"""shard_map overhead check: the canonical ResUNet train step as (a) the
plain single-chip jit program and (b) the shard_map DP program on a
1-device TPU mesh — the formulations should cost the same, certifying
that dp_shard_map's per-chip program matches single-chip performance
(the multi-chip win is then pure scale-out over ICI)."""

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
    from flax import nnx

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.parallel.mesh import batch_sharding, data_mesh
    from pssr2_tpu.train import _build_paired_steps, _build_shard_map_steps
    from pssr2_tpu.util import SSIMLoss

    def sync(v):
        return float(jnp.ravel(v)[0])

    print(f"devices: {jax.devices()}", flush=True)
    B = 16
    mesh = data_mesh(1)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    rng = np.random.default_rng(0)
    hr_np = rng.integers(0, 255, (B, 1, 512, 512)).astype(np.uint8)
    key = jax.random.key(0)

    results = {}
    for name in ("plain", "shard_map"):
        model = ResUNet(dtype=jnp.bfloat16)
        model.train()
        optim = AdamW(1e-3)
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        if name == "plain":
            step, _ = _build_paired_steps(
                SSIMLoss(mix=0.8, ms=True), False,
                lambda key, batch, augment: base(key, batch),
            )
            step = nnx.cached_partial(step, model, optimizer)
            batch = jnp.asarray(hr_np)

            def run(step=step, batch=batch, lr=optim.lr):
                return step(batch, None, key, lr, B, False)[0]
        else:
            def gen_pair(key, batch, augment, key_block=None):
                return base(key, batch, key_block=key_block)

            step, _ = _build_shard_map_steps(
                SSIMLoss(mix=0.8, ms=True), False, gen_pair, mesh, B
            )
            step = nnx.cached_partial(step, model, optimizer)
            batch = jax.device_put(hr_np, batch_sharding(mesh))

            def run(step=step, batch=batch, lr=optim.lr):
                return step(batch, None, key, lr, B, False)[0]

        for _ in range(3):
            sync(run())
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(8):
                out = run()
            sync(out)
            times.append((time.perf_counter() - t0) / 8 * 1e3)
        results[name] = {
            "median_ms": round(sorted(times)[len(times) // 2], 2),
            "loss": sync(run()),
        }
        print(json.dumps({name: results[name]}), flush=True)

    with open(os.path.join(HERE, "shardmap_tpu_timing.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
