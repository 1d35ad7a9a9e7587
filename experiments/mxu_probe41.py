"""Probe39: BWD_ROWS (window-rows per bwd-kernel grid step) A/B on the
fused SwinIR train step, interleaved protocol (see mxu_probe37).
ROWS=2 halved the fwd kernel's per-grid-step issue overhead
(mxu_probe30); the bwd kernel's live set is ~2.5x larger, so 2 may OOM
or may win — measured here."""
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
    for ab in ("none", "no_attn_bwd", "no_dw", "no_ln_bwd", "no_mlp_bwd"):
        swinblock.ABLATE_BWD = ab
        model = SwinIR(image_size=128, dtype=jnp.bfloat16)
        model.train()
        optim = AdamW(1e-3)
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        step, _ = _build_paired_steps(
            SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch))
        step = nnx.cached_partial(step, model, optimizer)
        def run(step=step, lr=optim.lr):
            return step(hr, None, key, lr, B, False)[0]
        try:
            for _ in range(2):
                sync(run())
        except Exception as e:
            print(json.dumps({"ablate": ab, "error": str(e)[:300]}), flush=True)
            continue
        steps.append((ab, run))
        print(f"compiled {ab}", flush=True)
    trials = {r: [] for r, _ in steps}
    for t in range(5):
        for r, run in steps:
            t0 = time.perf_counter()
            for _ in range(4):
                out = run()
            sync(out)
            trials[r].append(round((time.perf_counter() - t0) / 4 * 1e3, 2))
        print(json.dumps({"trial": t, **{str(r): trials[r][-1] for r in trials}}), flush=True)
    res = {str(r): {"median_ms": sorted(v)[len(v)//2], "trials": v} for r, v in trials.items()}
    print(json.dumps(res), flush=True)
    with open(os.path.join(HERE, "mxu_probe41.json"), "w") as f:
        json.dump(res, f, indent=1)

if __name__ == "__main__":
    main()
