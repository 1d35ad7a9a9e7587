"""Shared test fixtures: synthetic tif stacks and random images
(mirrors the reference test fixture style, reference: tests/_util.py)."""

import os
from pathlib import Path

import numpy as np

HR_RES = 512
LR_RES = 128
CROP_RES = 500


def get_shape(res: int, channels: int = 1, batch: int = 2):
    return (batch, channels, res, res) if batch > 0 else (channels, res, res)


def get_image(shape, seed=None):
    rng = np.random.default_rng(seed)
    return rng.random(shape) * 255


def make_tifs(path: Path, shape):
    from pssr2_tpu.data.tiff import imwrite

    os.makedirs(path, exist_ok=True)
    shape = (1, *shape) if len(shape) <= 3 else shape
    images = np.random.rand(*shape) * 255
    for idx, image in enumerate(images):
        imwrite(f"{path}/temp_tif_{idx}.tif", image.squeeze().astype(np.uint8))
