"""Quality parity experiment: f32 vs bf16-compute training on structured
synthetic data.  Result (2026-08, CPU, 20 epochs, ResUNet[16,32] x4 on
sinusoidal phantoms): PSNR delta f32-bf16 = 0.031 dB — inside the 0.1 dB
parity budget, so bf16 compute (f32 params) is the recommended config.

    python experiments/bf16_quality.py
"""

import pathlib
import random
import tempfile

import numpy as np
import jax.numpy as jnp

from pssr2_tpu.data import ImageDataset, tiff
from pssr2_tpu.models import ResUNet
from pssr2_tpu.optim import AdamW
from pssr2_tpu.predict import test_metrics
from pssr2_tpu.train import train_paired
from pssr2_tpu.util import MSELoss


def main():
    root = pathlib.Path(tempfile.mkdtemp()) / "imgs"
    root.mkdir()
    yy, xx = np.mgrid[0:128, 0:128]
    rng = np.random.default_rng(0)
    for i in range(10):
        img = 127 + 100 * np.sin(xx / (2 + i)) * np.cos(yy / (3 + i)) + rng.normal(0, 5, (128, 128))
        tiff.imwrite(root / f"{i}.tif", np.clip(img, 0, 255).astype(np.uint8))

    results = {}
    for name, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        random.seed(1)
        np.random.seed(1)
        ds = ImageDataset(root, hr_res=128, lr_scale=4, val_split=0.2)
        model = ResUNet(hidden=[16, 32], depth=2, dtype=dtype)
        train_paired(model, ds, batch_size=4, loss_fn=MSELoss(), optim=AdamW(2e-3), epochs=20, seed=3)
        results[name] = test_metrics(model, ds, norm=False)
        print(name, {k: round(v, 4) for k, v in results[name].items()})

    print(f"PSNR delta f32-bf16: {results['f32']['psnr'] - results['bf16']['psnr']:.3f} dB")


if __name__ == "__main__":
    main()
