"""Sweep XLA TPU flags over the canonical fused train step.

Each flag set runs in a SUBPROCESS (XLA_FLAGS is read at backend init).
Measures the full fused train step (bf16, B=16, MS-SSIM mix) with the
back-to-back dispatch harness.  Writes xla_flags_sweep.json.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) if "__file__" in dir() else "/root/repo")
sys.path.insert(0, "/root/repo")
import numpy as np
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

B = 16
key = jax.random.key(0)
base = make_device_gen_pair(4, Poisson(), None, augment=True)
hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
model = ResUNet(dtype=jnp.bfloat16)
model.train()
optim = AdamW(1e-3)
optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
loss_fn = SSIMLoss(mix=0.8, ms=True)
step, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
step = nnx.cached_partial(step, model, optimizer)
fn = lambda: step(hr_u8, None, key, optim.lr, B, False)[0]
for _ in range(3):
    sync(fn())
best = float("inf")
for _ in range(4):
    t0 = time.perf_counter()
    for _ in range(8):
        out = fn()
    sync(out)
    best = min(best, (time.perf_counter() - t0) / 8)
print("RESULT_MS", round(best * 1e3, 3))
"""

SWEEPS = [
    ("baseline", ""),
    ("latency-hiding-scheduler", "--xla_latency_hiding_scheduler_rerun=2"),
    ("aggressive-fusion", "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
    ("vmem-big", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("async-collectives", "--xla_enable_async_all_gather=true"),
    ("rwb-off", "--xla_tpu_rwb_fusion=false"),
    (
        "combo",
        "--xla_tpu_scoped_vmem_limit_kib=65536 --xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
    ),
]


def main():
    results = []
    child = os.path.join(HERE, "_flags_child.py")
    with open(child, "w") as f:
        f.write(CHILD)
    for name, flags in SWEEPS:
        env = dict(os.environ)
        if flags:
            env["LIBTPU_INIT_ARGS"] = flags
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        print(f"=== {name}: {flags!r}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, child], env=env, capture_output=True, text=True, timeout=2400
            )
            ms = None
            for line in out.stdout.splitlines():
                if line.startswith("RESULT_MS"):
                    ms = float(line.split()[1])
            if ms is None:
                print(out.stdout[-2000:])
                print(out.stderr[-2000:])
            results.append({"name": name, "flags": flags, "ms": ms})
            print(json.dumps(results[-1]), flush=True)
        except subprocess.TimeoutExpired:
            results.append({"name": name, "flags": flags, "ms": None, "timeout": True})
            print(f"{name}: TIMEOUT", flush=True)
        with open(os.path.join(HERE, "xla_flags_sweep.json"), "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
