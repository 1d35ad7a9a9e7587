"""Subprocess worker for the two-process multi-host feeding test.

Launched by tests/test_distributed.py with argv:
    process_id coordinator_port data_dir
Each process owns 2 virtual CPU devices; together they form a 4-device
global ``data`` mesh.  Prints ``RESULT pid=<i> val=<loss>`` on success.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid, port, data_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pssr2_tpu.parallel.distributed import initialize  # noqa: E402

initialize(coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid)

from pssr2_tpu.data import ImageDataset  # noqa: E402
from pssr2_tpu.models import ResUNet  # noqa: E402
from pssr2_tpu.optim import AdamW  # noqa: E402
from pssr2_tpu.parallel.mesh import data_mesh  # noqa: E402
from pssr2_tpu.train import train_paired  # noqa: E402
from pssr2_tpu.util import MSELoss  # noqa: E402

assert len(jax.devices()) == 4, f"global devices: {jax.devices()}"
assert jax.process_count() == 2

dataset = ImageDataset(data_dir, hr_res=32, val_split=0.25)
model = ResUNet(hidden=[4, 8], depth=1, scale=4)
train_losses, val_losses = train_paired(
    model,
    dataset,
    batch_size=4,
    loss_fn=MSELoss(),
    optim=AdamW(1e-3),
    epochs=1,
    mesh=data_mesh(),
    seed=3,
)
print(f"RESULT pid={pid} val={val_losses[-1]:.6f}", flush=True)
