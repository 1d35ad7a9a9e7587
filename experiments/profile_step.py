"""Capture a jax.profiler trace of the canonical fused train step and
extract a per-op time table via tensorboard_plugin_profile.

Writes experiments/profile_out/ (xplane + converted tools) and prints the
top ops by self-time.  If the axon platform emits no device plane, says so.
"""

import glob
import gzip
import json
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

    def sync(v):
        return float(jnp.ravel(v)[0])

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
    step = nnx.cached_partial(step, model, optimizer)

    def run():
        return step(hr_u8, None, key, optim.lr, B, False)[0]

    for _ in range(3):
        sync(run())

    os.makedirs(OUT, exist_ok=True)
    jax.profiler.start_trace(OUT)
    for _ in range(3):
        out = run()
    sync(out)
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        print("NO XPLANE CAPTURED (axon may not support device tracing)")
        return

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    params = {"graph_viewer_options": {}}
    for tool in ("op_profile", "framework_op_stats^", "overview_page^", "op_profile^"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, tool, params)
            name = tool.strip("^").replace("^", "")
            path = os.path.join(OUT, f"{name}.json")
            if isinstance(data, bytes):
                try:
                    data = gzip.decompress(data)
                except OSError:
                    pass
                with open(path, "wb") as f:
                    f.write(data)
            else:
                with open(path, "w") as f:
                    f.write(data if isinstance(data, str) else json.dumps(data))
            print(f"wrote {path}", flush=True)
        except Exception as e:
            print(f"{tool}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
