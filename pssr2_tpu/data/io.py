"""Host-side image IO and the pair-generation transform chain.

Mirrors the behavioral contract of the reference's loading helpers
(reference: pssr/data.py:471-627) on numpy (no torch): decode tif/czi/PIL,
crop/pad/rotate, PIL-matched downscale, crappify, emit float32 [0,255]
channel-first arrays.

The TPU fast path bypasses most of this: datasets also expose raw uint8 HR
patches that the jitted device pipeline (pssr2_tpu.data.pipeline) degrades
in HBM.  This module is the parity/reference path used by prediction,
preprocessing and crappifier approximation.
"""

import os
import warnings
from pathlib import Path

import numpy as np
from PIL import Image

# microscopy sheets routinely exceed PIL's decompression-bomb threshold
# (reference: pssr/train.py:17)
Image.MAX_IMAGE_PIXELS = None

from ..crappifiers import Crappifier
from ..ops.resize import resize_bilinear_np
from . import tiff
from .indexing import slice_center, slice_image


def load_image(path, file, mode, n_frames, slices, idx):
    """Decode one pre-tiled image file and select its frame window
    (reference: pssr/data.py:566-577)."""
    extension = file.split(".")[-1].lower()
    if extension in ("tif", "tiff"):
        image = tiff.imread(Path(path, file))
        if image.ndim < 3:
            image = image[np.newaxis]
    else:
        image = frame_channel(Image.open(Path(path, file)), mode)
    return slice_image(image, n_frames, slices, idx, slide=False)


def load_sheet(path, file, stack, mode):
    """Decode one image sheet; czi axes are normalized to TZCXY then
    flattened per the stack mode (reference: pssr/data.py:579-627)."""
    extension = file.split(".")[-1].lower()
    if extension == "czi":
        from . import czi

        image, axes = czi.read_czi(Path(path, file))
        out_axes = "TZCXY"

        slice_idx, slice_axes = [], []
        for axis in axes:
            if axis not in out_axes:
                slice_idx.append(0)
            else:
                slice_idx.append(slice(None))
                slice_axes.append(axis)
        image = image[tuple(slice_idx)]

        axes_idx = [out_axes.rfind(axis) for axis in slice_axes]
        image = np.moveaxis(image, range(image.ndim), axes_idx)

        if mode == "L":
            image = np.mean(image, axis=2)
        if stack == "T":
            image = image[:, 0]
        elif stack == "Z":
            image = image[0]
        elif stack == "ZT":
            image = np.moveaxis(image, 0, 1)
        elif stack == "TZ":
            pass
        else:
            raise ValueError(f"Stack type {stack} is not valid.")

        image = np.reshape(image, [-1, image.shape[-2], image.shape[-1]])
        if image.max() != 0:
            image = image / (image.max() / 255)
        return image.astype(np.uint8)
    elif extension in ("tif", "tiff"):
        image = tiff.imread(Path(path, file))
        if image.ndim < 3:
            image = image[np.newaxis]
        return image
    else:
        return frame_channel(Image.open(Path(path, file)), mode)


def frame_channel(image, mode="L"):
    """PIL image -> (frames, H, W) uint8 (reference: pssr/data.py:640-647)."""
    n_frames = getattr(image, "n_frames", 1)
    if n_frames > 1:
        frames = []
        for frame in range(n_frames):
            image.seek(frame)
            frames.append(np.asarray(image.convert(mode), dtype=np.uint8))
        return np.stack(frames)
    return np.asarray(image.convert(mode), dtype=np.uint8)[np.newaxis, :, :]


def probe_frames_and_size(path, file):
    """(n_frames, max_side) metadata probe without decoding pixel data where
    possible — replaces the reference's full PIL open at init
    (reference: pssr/data.py:70-74)."""
    extension = file.split(".")[-1].lower()
    full = Path(path, file)
    if extension in ("tif", "tiff"):
        try:
            n, (h, w) = tiff.num_pages_and_size(full)
            return n, max(h, w)
        except Exception:
            pass
    image = Image.open(full)
    return getattr(image, "n_frames", 1), max(image.size)


def probe_shape(path, file):
    """(n_frames, (height, width)) metadata probe without decoding pixel
    data where possible — for init-time extra_path shape validation
    (reference: pssr/data.py:76-80)."""
    extension = file.split(".")[-1].lower()
    full = Path(path, file)
    if extension in ("tif", "tiff"):
        try:
            n, (h, w) = tiff.num_pages_and_size(full)
            return n, (h, w)
        except Exception:
            pass
    image = Image.open(full)
    return getattr(image, "n_frames", 1), (image.size[1], image.size[0])


def square_crop(image, max_res):
    """Center square crop (reference: pssr/data.py:536-546)."""
    height, width = image.shape[-2:]
    if [height, width] == [max_res] * 2:
        return image
    size = min(height, width, max_res)
    start_x = (height - size) // 2
    start_y = (width - size) // 2
    return image[:, start_x : start_x + size, start_y : start_y + size]


def pad_image(image, res):
    """Reflect-pad bottom/right up to res (reference: pssr/data.py:548-551)."""
    if image.shape[-1] < res:
        pad = res - image.shape[-1]
        return np.stack([np.pad(channel, pad_width=[[0, pad]] * 2, mode="reflect") for channel in image])
    return image


def apply_rotation(image, rotation):
    """rotation = [rot90?, flip-axis] (reference: pssr/data.py:478-480)."""
    if rotation:
        image = np.rot90(image, axes=(1, 2)) if rotation[0] else image
        image = np.flip(image, axis=rotation[1])
    return image


def downscale_pil_like(hr, lr_res):
    """PIL-BILINEAR-matched downscale with uint8 rounding, as the reference
    produces integer-valued LR before crappification (pssr/data.py:483)."""
    lr = resize_bilinear_np(hr, lr_res, lr_res)
    return np.clip(np.round(lr), 0, 255).astype(np.float32)


def array_ready(image, transforms):
    """Finalize to float32 and run user transforms
    (reference _tensor_ready: pssr/data.py:526-534)."""
    image = np.ascontiguousarray(image).astype(np.float32)
    if transforms is not None:
        for transform in transforms:
            image = transform(image)
    return image


def gen_pair(hr, hr_res, lr_scale, rotation, crappifier, transforms, n_frames):
    """HR patch -> (hr, lr) training pair with crappification
    (reference: pssr/data.py:471-495)."""
    hr = square_crop(hr, hr_res)
    hr = pad_image(hr, hr_res)
    hr = apply_rotation(hr, rotation)

    lr = downscale_pil_like(hr, hr_res // lr_scale)
    if crappifier is not None:
        lr = crappifier.crappify(lr) if isinstance(crappifier, Crappifier) else crappifier(lr)
        lr = np.clip(np.asarray(lr).round(), 0, 255)

    if n_frames is not None and n_frames[0] != n_frames[1]:
        if not n_frames[1] > hr.shape[-3]:
            hr = slice_center(hr, n_frames[1])
        if not n_frames[0] > lr.shape[-3]:
            lr = slice_center(lr, n_frames[0])

    return array_ready(hr, transforms), array_ready(lr, transforms)


def transform_pair(hr, lr, hr_res, lr_res, rotation, transforms, n_frames):
    """Paired HR/LR transform without crappifier
    (reference: pssr/data.py:497-516)."""
    hr = square_crop(hr, hr_res)
    lr = square_crop(lr, lr_res)
    hr = pad_image(hr, hr_res)
    lr = pad_image(lr, lr_res)

    if rotation:
        hr = np.rot90(hr, axes=(1, 2)) if rotation[0] else hr
        lr = np.rot90(lr, axes=(1, 2)) if rotation[0] else lr
        hr = np.flip(hr, axis=rotation[1])
        lr = np.flip(lr, axis=rotation[1])

    if n_frames is not None and n_frames[0] != n_frames[1]:
        if not n_frames[1] > hr.shape[-3]:
            hr = slice_center(hr, n_frames[1])
        if not n_frames[0] > lr.shape[-3]:
            lr = slice_center(lr, n_frames[0])

    return array_ready(hr, transforms), array_ready(lr, transforms)


def ready_lr(lr, lr_res, transforms):
    """LR-mode item processing (reference: pssr/data.py:518-524)."""
    lr = square_crop(lr, lr_res)
    lr = pad_image(lr, lr_res)
    return array_ready(lr, transforms)


def preload_sheets(preload, paths, files, mode, stack):
    """Optionally preload sheets into host RAM with a memory-budget warning
    (reference: pssr/data.py:553-564)."""
    if not preload:
        return False

    import psutil

    size = sum(
        sum(os.stat(Path(idx_path, file)).st_size for file in idx_files)
        for idx_path, idx_files in zip(paths, files)
    ) / 10**9
    memory = psutil.virtual_memory().available / 10**9
    if size > memory:
        warnings.warn(
            f"Total dataset size {size:.2f}GB is greater than available memory of "
            f"{memory:.2f}GB. Consider disabling preloading to avoid potential slowdowns.",
            stacklevel=2,
        )

    loaded = [
        [load_sheet(idx_path, file, stack, mode) for file in idx_files]
        for idx_path, idx_files in zip(paths, files)
    ]
    return loaded[0] if len(loaded) == 1 else loaded
