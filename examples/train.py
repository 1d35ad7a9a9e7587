"""End-to-end training example (counterpart of the reference's
notebooks/train.ipynb): canonical ResUNet x4 on crappified patches.

Run with a folder of high-resolution grayscale tif images:
    python examples/train.py path/to/hr_images
"""

import sys

import jax.numpy as jnp

from pssr2_tpu.crappifiers import Poisson
from pssr2_tpu.data import ImageDataset
from pssr2_tpu.models import ResUNet
from pssr2_tpu.optim import AdamW, ExponentialLR
from pssr2_tpu.parallel import data_mesh
from pssr2_tpu.predict import predict_collage
from pssr2_tpu.profiler import StepTimer
from pssr2_tpu.train import train_paired
from pssr2_tpu.util import SSIMLoss
from pssr2_tpu.checkpoint import save_weights

import jax


def main(path):
    dataset = ImageDataset(path, hr_res=512, lr_scale=4, crappifier=Poisson())
    model = ResUNet(dtype=jnp.bfloat16)
    optim = AdamW(lr=1e-3)
    mesh = data_mesh() if len(jax.devices()) > 1 else None

    timer = StepTimer()
    train_losses, val_losses = train_paired(
        model,
        dataset,
        batch_size=16,
        loss_fn=SSIMLoss(mix=0.8, ms=True),
        optim=optim,
        epochs=10,
        scheduler=ExponentialLR(optim, 0.7),
        checkpoint_dir="checkpoints",
        collage_dir="collages",
        state_dir="train_state",  # crash/SIGTERM-resumable
        callbacks=[timer],
        mesh=mesh,
    )
    print("throughput:", timer.summary())

    save_weights(model, f"ResUNet_128-512_{val_losses[-1]:.4f}.npz")
    predict_collage(model, dataset, out_dir="preds")


if __name__ == "__main__":
    main(sys.argv[1])
