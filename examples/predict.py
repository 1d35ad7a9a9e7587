"""Tiled sheet inference example (counterpart of the reference's
notebooks/predict.ipynb): predict tiles from LR sheets and reassemble.

    python examples/predict.py lr_sheets/ model.npz
"""

import sys

from pssr2_tpu.checkpoint import load_weights
from pssr2_tpu.data import SlidingDataset
from pssr2_tpu.models import ResUNet
from pssr2_tpu.parallel import data_mesh
from pssr2_tpu.predict import predict_images
from pssr2_tpu.util import reassemble_sheets

import jax

LR_RES = 128
OVERLAP = 32


def main(lr_path, model_path):
    # LR mode: sheets are tiled with overlap at LR resolution
    dataset = SlidingDataset(lr_path, hr_res=LR_RES, lr_scale=-1, overlap=OVERLAP, extension="tif", val_split=1)
    model = ResUNet()
    load_weights(model, model_path)

    mesh = data_mesh() if len(jax.devices()) > 1 else None
    preds = predict_images(model, dataset, out_dir=None, batch_size=16, mesh=mesh)

    # overlap-averaged reassembly with margins to cut grid artifacts
    reassemble_sheets(preds, lr_path, lr_scale=4, overlap=OVERLAP, margin=8, out_dir="sheets")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
