"""Capture a jax.profiler trace of any family's canonical train step.

FAMILY=resuneta|rdresuneta|resunet|rdresunet|swinir (default resuneta).
Writes experiments/profile_out_<family>/ xplane; attribute with
analyze_xplane4.py <xplane.pb>.
"""

import glob
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

    jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import RDResUNet, RDResUNetA, ResUNet, ResUNetA, SwinIR
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    def sync(v):
        return float(jnp.ravel(v)[0])

    fam = os.environ.get("FAMILY", "resuneta").lower()
    dt = jnp.bfloat16
    makers = {
        "resunet": lambda: ResUNet(dtype=dt),
        "resuneta": lambda: ResUNetA(dtype=dt),
        "rdresunet": lambda: RDResUNet(dtype=dt),
        "rdresuneta": lambda: RDResUNetA(dtype=dt),
        "swinir": lambda: SwinIR(image_size=128, dtype=dt),
    }
    out_dir = os.path.join(HERE, f"profile_out_{fam}")

    print(f"devices: {jax.devices()}  family={fam}", flush=True)
    B = 16
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8)
    )
    model = makers[fam]()
    model.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
    step, _ = _build_paired_steps(
        SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch)
    )
    step = nnx.cached_partial(step, model, optimizer)

    def run():
        return step(hr_u8, None, key, optim.lr, B, False)[0]

    for _ in range(3):
        sync(run())
    t0 = time.perf_counter()
    for _ in range(6):
        out = run()
    sync(out)
    print(f"warm step: {(time.perf_counter() - t0) / 6 * 1e3:.2f} ms", flush=True)

    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        out = run()
    sync(out)
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", xplanes, flush=True)


if __name__ == "__main__":
    main()
