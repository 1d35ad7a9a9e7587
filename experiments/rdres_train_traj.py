"""Quality gate for the fused RDNet block-tail path: loss trajectories of
the SAME RDResUNet training run (identical seeds/data) through the fused
LN+fc1+GELU+fc2 kernels (ops/pallas/rdtail) vs the unfused XLA path, on
real TPU.

The fused forward is in the bf16-rounding class of the XLA path (poly
gelu, rel ~5.7e-3 — same class as swinblock, see mxu_probe30) and its
backward is the exact VJP of that forward, so trajectories should track
within bf16 training noise; a formulation bug would diverge fast.
(Protocol copied from swinir_train_traj.py.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
STEPS = int(os.environ.get("TRAJ_STEPS", 60))
B = int(os.environ.get("TRAJ_BATCH", 8))


def run(mode):
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import RDResUNet
    from pssr2_tpu.ops.pallas import rdtail
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    rdtail.MODE = mode
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    model = RDResUNet(dtype=jnp.bfloat16)
    model.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
    step, _ = _build_paired_steps(
        SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch)
    )
    step = nnx.cached_partial(step, model, optimizer)
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.integers(0, 255, (STEPS, B, 1, 512, 512)).astype(np.uint8))
    losses = []
    for i in range(STEPS):
        key = jax.random.key(i)
        loss, _, _ = step(hr[i], None, key, optim.lr, B, False)
        losses.append(float(loss))
    return losses


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    fused = run("auto")
    print(json.dumps({"mode": "fused", "first": fused[0], "last": fused[-1]}), flush=True)
    unfused = run("off")
    print(json.dumps({"mode": "unfused", "first": unfused[0], "last": unfused[-1]}), flush=True)
    f = np.asarray(fused)
    u = np.asarray(unfused)
    rel = np.abs(f - u) / np.maximum(np.abs(u), 1e-6)
    out = {
        "steps": STEPS,
        "batch": B,
        "loss_fused_first_last": [fused[0], fused[-1]],
        "loss_unfused_first_last": [unfused[0], unfused[-1]],
        "max_rel_dev": float(rel.max()),
        "mean_rel_dev_last10": float(rel[-10:].mean()),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "rdres_train_traj.json"), "w") as fjson:
        json.dump({"fused": fused, "unfused": unfused, **out}, fjson, indent=1)


if __name__ == "__main__":
    main()
