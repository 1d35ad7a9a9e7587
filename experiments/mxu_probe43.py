"""Probe43: RESHAPE_HEADS (sublane-split reshape head stacking, bit-equal
to the slice/concat chains but ~40 fewer ops per grid step) on the fused
SwinIR canonical TRAIN step, interleaved protocol.  The kernels are
op-issue-bound (probe41), so pure op-count reduction is the lever."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
HERE = os.path.dirname(os.path.abspath(__file__))

def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import SwinIR
    from pssr2_tpu.ops.pallas import swinblock
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    def sync(v): return float(jnp.ravel(v)[0])
    B = 16
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    steps = []
    losses = {}
    for flag in (False, True):
        swinblock.RESHAPE_HEADS = flag
        model = SwinIR(image_size=128, dtype=jnp.bfloat16)
        model.train()
        optim = AdamW(1e-3)
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        step, _ = _build_paired_steps(
            SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch))
        step = nnx.cached_partial(step, model, optimizer)
        def run(step=step, lr=optim.lr):
            return step(hr, None, key, lr, B, False)[0]
        name = f"reshape={flag}"
        try:
            for _ in range(2):
                losses[name] = sync(run())
        except Exception as e:
            print(json.dumps({"config": name, "error": str(e)[:300]}), flush=True)
            continue
        steps.append((name, run))
        print(f"compiled {name}  loss={losses[name]}", flush=True)
    trials = {n: [] for n, _ in steps}
    for t in range(5):
        for n, run in steps:
            t0 = time.perf_counter()
            for _ in range(4):
                out = run()
            sync(out)
            trials[n].append(round((time.perf_counter() - t0) / 4 * 1e3, 2))
        print(json.dumps({"trial": t, **{n: trials[n][-1] for n in trials}}), flush=True)
    res = {n: {"median_ms": sorted(v)[len(v)//2], "trials": v} for n, v in trials.items()}
    res["losses"] = losses
    print(json.dumps(res), flush=True)
    with open(os.path.join(HERE, "mxu_probe43.json"), "w") as f:
        json.dump(res, f, indent=1)

if __name__ == "__main__":
    main()
