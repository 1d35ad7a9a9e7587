
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
