"""The four PSSR dataset types, host-side.

Same constructor surface, length arithmetic, val-split semantics, LR mode,
extra-image support and naming scheme as the reference
(reference: pssr/data.py:12-467), rebuilt on numpy without torch:

- ``__getitem__`` returns float32 [0,255] channel-first arrays — the parity
  path used by prediction, preprocessing and crappifier fitting.
- ``hr_patch(idx)`` returns the raw uint8 HR window *before*
  rotation/downscale/crappification — the TPU fast path consumed by the
  on-device input pipeline (pssr2_tpu.data.pipeline), which performs those
  steps fused in HBM.
"""

import glob
import os
import random
import warnings
from pathlib import Path

import numpy as np

from ..crappifiers import Crappifier, Poisson

_DEFAULT_CRAPPIFIER = object()  # sentinel: default Poisson(), but explicit None disables noise
from . import tiff
from .indexing import (
    get_image_idx,
    get_n_frames,
    get_val_idx,
    n_tiles,
    sliding_window,
)
from .io import (
    gen_pair,
    load_image,
    load_sheet,
    pad_image,
    preload_sheets,
    probe_frames_and_size,
    ready_lr,
    square_crop,
    transform_pair,
    array_ready,
    apply_rotation,
)


def _root_glob(search, root_dir, recursive: bool = True):
    """Recursive sorted glob relative to root (reference: pssr/data.py:675-680)."""
    if recursive:
        files = glob.glob(f"{root_dir}/**/{search}", recursive=True)
    else:
        files = glob.glob(f"{root_dir}/{search}")
    return sorted([item.split(str(root_dir), maxsplit=1)[-1].strip("/") for item in files])


def _as_path(path):
    return Path(path) if isinstance(path, str) else path


def _check_path(path):
    if not path or not path.exists():
        raise FileNotFoundError(f'Path "{path}" does not exist.')


def _glob_or_raise(path, extension):
    files = _root_glob(f"*.{extension}", root_dir=path)
    if not files:
        raise FileNotFoundError(f'No .{extension} files exist in path "{path}".')
    return files


def _random_rotation():
    return [bool(random.getrandbits(1)), random.choice((1, 2, (1, 2)))]


def _check_extra_shape(file, shape, frames, extra_shape, extra_frames, extra_scale, n_frames):
    """Init-time validation of extra-image shape/frame-count agreement,
    with the reference's explanatory errors (reference: pssr/data.py:76-80,
    212-216) instead of opaque stacking failures mid-training."""
    needed_extra = tuple(size * extra_scale for size in shape)
    if tuple(extra_shape) != needed_extra:
        raise ValueError(
            f'The corresponding image to "{file}" does not have the correct shape. '
            f'From image shape of {tuple(shape)} and "extra_scale" of {extra_scale}, '
            f"expected extra image shape of {needed_extra}, but got {tuple(extra_shape)}."
        )
    if frames != extra_frames and n_frames is not None:
        raise ValueError(
            f'The corresponding image to "{file}" does not have the correct number of '
            f"frames. n_frames must be -1 if number of image and extra_image frames are "
            f"not equal. Respective number of frames are {frames} and {extra_frames}"
        )


class _DatasetBase:
    """Shared iteration protocol (stands in for torch.utils.data.Dataset)."""

    def __iter__(self):
        for idx in range(len(self)):
            yield self[idx]


class ImageDataset(_DatasetBase):
    def __init__(
        self,
        path: Path,
        hr_res: int = 512,
        lr_scale: int = 4,
        crappifier: Crappifier = _DEFAULT_CRAPPIFIER,
        n_frames: list[int] = -1,
        extension: str = "tif",
        val_split: float = 0.1,
        rotation: bool = True,
        split_seed: int = 0,
        extra_path: Path = None,
        extra_scale: int = 1,
        transforms: list = None,
        preload: bool = False,
    ):
        """Training dataset for pre-tiled high-resolution image files,
        returning (hr, lr) pairs with on-the-fly crappification.

        LR mode (loads only unmodified low-resolution images for prediction)
        is enabled when images are <= ``hr_res/lr_scale`` or ``lr_scale=-1``.

        (reference: pssr/data.py:12-130; same args/semantics.  ``preload``
        is an extension the reference only offers for sliding datasets:
        keep decoded images in host RAM — at real training throughput the
        per-epoch re-decode is the bottleneck, not the TPU.)
        """
        self.path = _as_path(path)
        _check_path(self.path)
        self.hr_files = _glob_or_raise(self.path, extension)

        if extra_path is not None:
            self.extra_path = _as_path(extra_path)
            _check_path(self.extra_path)
            self.extra_hr_files = _glob_or_raise(self.extra_path, extension)
            if len(self.hr_files) != len(self.extra_hr_files):
                raise FileNotFoundError(
                    f'Number of files in "path" and "extra_path" are not equal. Found '
                    f"{len(self.hr_files)} files and {len(self.extra_hr_files)} files respectively."
                )
        else:
            self.extra_path = None
            self.extra_hr_files = None

        lr_scale = None if lr_scale == -1 else lr_scale
        self.mode = "L"
        self.n_frames = get_n_frames(n_frames)

        self.slices, max_size = [], 0
        for image_idx in range(len(self.hr_files)):
            if self.extra_hr_files is not None:
                from .io import probe_shape

                frames, shape = probe_shape(self.path, self.hr_files[image_idx])
                size = max(shape)
                eframes, eshape = probe_shape(self.extra_path, self.extra_hr_files[image_idx])
                _check_extra_shape(
                    self.hr_files[image_idx], shape, frames, eshape, eframes, extra_scale, self.n_frames
                )
            else:
                frames, size = probe_frames_and_size(self.path, self.hr_files[image_idx])
            self.slices.append(1 if self.n_frames is None else frames // max(self.n_frames))
            max_size = max(size, max_size)

        self.val_idx = get_val_idx(self.slices, val_split, split_seed)
        self.crop_res = min(hr_res, max_size)

        self.is_lr = lr_scale is None or max_size <= hr_res // lr_scale
        if self.is_lr:
            print("LR mode is enabled, dataset will load only unmodified low-resolution images.")
            if val_split < 1:
                warnings.warn(
                    "val_split is less than 1, not all low-resolution images will be used in prediction.",
                    stacklevel=2,
                )

        self.hr_res = hr_res
        self.lr_scale = lr_scale if lr_scale is not None else 1
        self.crappifier = Poisson() if crappifier is _DEFAULT_CRAPPIFIER else crappifier
        self.rotation = rotation
        self.extra_scale = extra_scale
        self.transforms = transforms

        self.preload = None
        if preload:
            from .io import load_image as _li

            self.preload = [
                _li(self.path, f, self.mode, None, 1, 0) for f in self.hr_files
            ]

    def _load(self, image_idx, idx):
        if self.preload is not None:
            from .indexing import slice_image

            n = max(self.n_frames) if self.n_frames is not None else None
            return slice_image(self.preload[image_idx], n, self.slices[image_idx], idx, slide=False)
        return load_image(
            self.path,
            self.hr_files[image_idx],
            self.mode,
            max(self.n_frames) if self.n_frames is not None else None,
            self.slices[image_idx],
            idx,
        )

    def __getitem__(self, idx, pp=False):
        if idx >= len(self):
            raise IndexError(
                f"Tried to retrieve invalid image. Index {idx} is not less than "
                f"{len(self)} total image frame slices."
            )
        is_val = idx in self.val_idx or pp
        image_idx, idx = get_image_idx(idx, self.slices)

        hr = self._load(image_idx, idx)
        cur_rot = _random_rotation() if self.rotation and not is_val else False

        if self.is_lr:
            out = ready_lr(hr, self.hr_res // self.lr_scale, self.transforms)
        else:
            out = gen_pair(hr, self.hr_res, self.lr_scale, cur_rot, self.crappifier, self.transforms, self.n_frames)

        if self.extra_hr_files is not None:
            extra = load_image(
                self.extra_path,
                self.extra_hr_files[image_idx],
                self.mode,
                max(self.n_frames) if self.n_frames is not None else None,
                self.slices[image_idx],
                idx,
            )
            extra = apply_rotation(extra, cur_rot)
            extra = array_ready(extra, self.transforms)
            return out, extra
        return out

    def hr_patch(self, idx):
        """TPU fast path: raw uint8 HR window (crop/pad only; rotation,
        downscale and crappification happen on device)."""
        image_idx, idx = get_image_idx(idx, self.slices)
        hr = self._load(image_idx, idx)
        hr = square_crop(hr, self.hr_res)
        hr = pad_image(hr, self.hr_res)
        return np.ascontiguousarray(hr).astype(np.uint8)

    def __len__(self):
        return sum(self.slices)

    def __repr__(self):
        res = (
            f"low-res: {self.hr_res // self.lr_scale}"
            if self.is_lr
            else f"high-res: {self.hr_res}, low-res: {self.hr_res // self.lr_scale}"
        )
        return (
            f'ImageDataset from path "{self.path}"\n'
            f"{len(self.hr_files)} files with {len(self)} total frame slices\n{res}"
        )

    def _get_name(self, idx):
        image_idx, idx = get_image_idx(idx, self.slices)
        return self.hr_files[image_idx].split(".")[0] + (f"_{idx}" if self.n_frames is not None else "")


class SlidingDataset(_DatasetBase):
    def __init__(
        self,
        path: Path,
        hr_res: int = 512,
        lr_scale: int = 4,
        crappifier: Crappifier = _DEFAULT_CRAPPIFIER,
        overlap: int = 128,
        n_frames: list[int] = -1,
        slide: bool = False,
        stack: str = "TZ",
        extension: str = "tif",
        preload: bool = True,
        val_split: float = 0.1,
        rotation: bool = True,
        split_seed: int = 0,
        extra_path: Path = None,
        extra_scale: int = 1,
        transforms: list = None,
    ):
        """Training dataset tiling large image sheets (e.g. .czi) with
        ``hr_res`` windows and ``overlap`` (reference: pssr/data.py:132-266).
        """
        self.path = _as_path(path)
        _check_path(self.path)
        self.hr_files = _glob_or_raise(self.path, extension)

        if extra_path is not None:
            self.extra_path = _as_path(extra_path)
            _check_path(self.extra_path)
            self.extra_hr_files = _glob_or_raise(self.extra_path, extension)
            if len(self.hr_files) != len(self.extra_hr_files):
                raise FileNotFoundError(
                    f'Number of files in "path" and "extra_path" are not equal. Found '
                    f"{len(self.hr_files)} files and {len(self.extra_hr_files)} files respectively."
                )
        else:
            self.extra_path = None
            self.extra_hr_files = None

        overlap = 0 if overlap is None else overlap
        if not hr_res > overlap:
            raise ValueError(
                f"hr_res must be greater than overlap. Given values are {hr_res} and {overlap} respectively."
            )
        self.stride = hr_res - overlap
        self.stack = stack.upper()

        lr_scale = None if lr_scale == -1 else lr_scale
        self.mode = "L"
        self.n_frames = get_n_frames(n_frames)
        self.slide = slide

        self.preload = preload_sheets(preload, [self.path], [self.hr_files], self.mode, self.stack)
        self.extra_preload = (
            preload_sheets(preload, [self.extra_path], [self.extra_hr_files], self.mode, self.stack)
            if self.extra_hr_files is not None
            else None
        )

        self.tiles, self.slices = [], []
        for image_idx in range(len(self.hr_files)):
            image = (
                self.preload[image_idx]
                if self.preload
                else load_sheet(self.path, self.hr_files[image_idx], self.stack, self.mode)
            )
            tiles_x, tiles_y = n_tiles(image.shape, hr_res, self.stride)
            self.tiles.append(tiles_x * tiles_y)
            self.slices.append(
                1
                if self.n_frames is None
                else (
                    (image.shape[0] - max(self.n_frames) + 1)
                    if slide
                    else (image.shape[0] // max(self.n_frames))
                )
            )

            if self.extra_hr_files is not None:
                extra_image = (
                    self.extra_preload[image_idx]
                    if self.extra_preload
                    else load_sheet(self.extra_path, self.extra_hr_files[image_idx], self.stack, self.mode)
                )
                _check_extra_shape(
                    self.hr_files[image_idx],
                    image.shape[1:],
                    image.shape[0],
                    extra_image.shape[1:],
                    extra_image.shape[0],
                    extra_scale,
                    self.n_frames,
                )

        self.val_idx = get_val_idx(self.slices, val_split, split_seed, self.tiles)
        self.crop_res = hr_res

        self.is_lr = lr_scale is None
        if self.is_lr:
            print("LR mode is enabled, dataset will load only unmodified low-resolution images.")
            if val_split < 1:
                warnings.warn(
                    "val_split is less than 1, not all low-resolution images will be used in prediction.",
                    stacklevel=2,
                )

        self.hr_res = hr_res
        self.lr_scale = lr_scale
        self.crappifier = Poisson() if crappifier is _DEFAULT_CRAPPIFIER else crappifier
        self.rotation = rotation
        self.extra_scale = extra_scale
        self.transforms = transforms

    def _sheet(self, image_idx):
        return (
            self.preload[image_idx]
            if self.preload
            else load_sheet(self.path, self.hr_files[image_idx], self.stack, self.mode)
        )

    def __getitem__(self, idx, pp=False):
        if idx >= len(self):
            raise IndexError(
                f"Tried to retrieve invalid image. Index {idx} is not less than "
                f"{len(self)} total image frame slices."
            )
        is_val = idx in self.val_idx or pp
        image_idx, idx = get_image_idx(idx, self.slices, self.tiles)

        hr = sliding_window(
            self._sheet(image_idx),
            self.hr_res,
            self.stride,
            max(self.n_frames) if self.n_frames is not None else None,
            self.slices[image_idx],
            idx,
            self.slide,
        )
        cur_rot = _random_rotation() if self.rotation and not is_val else False

        if self.is_lr:
            out = ready_lr(hr, self.hr_res, self.transforms)
        else:
            out = gen_pair(hr, self.hr_res, self.lr_scale, cur_rot, self.crappifier, self.transforms, self.n_frames)

        if self.extra_hr_files is not None:
            extra_sheet = (
                self.extra_preload[image_idx]
                if self.extra_preload
                else load_sheet(self.extra_path, self.extra_hr_files[image_idx], self.stack, self.mode)
            )
            extra = sliding_window(
                extra_sheet,
                self.hr_res * self.extra_scale,
                self.stride * self.extra_scale,
                max(self.n_frames) if self.n_frames is not None else None,
                self.slices[image_idx],
                idx,
                self.slide,
            )
            extra = apply_rotation(extra, cur_rot)
            extra = array_ready(extra, self.transforms)
            return out, extra
        return out

    def hr_patch(self, idx):
        """TPU fast path: raw uint8 HR tile (window extraction only)."""
        image_idx, idx = get_image_idx(idx, self.slices, self.tiles)
        hr = sliding_window(
            self._sheet(image_idx),
            self.hr_res,
            self.stride,
            max(self.n_frames) if self.n_frames is not None else None,
            self.slices[image_idx],
            idx,
            self.slide,
        )
        return np.ascontiguousarray(hr).astype(np.uint8)

    def hr_patch_batch(self, indices):
        """Batched tile gather through the native C++ extractor when sheets
        are preloaded uint8 — the PatchLoader hot path.  Falls back to
        per-index :meth:`hr_patch`."""
        from . import native
        from .indexing import n_tiles as _n_tiles

        if not self.preload or native.get_lib() is None:
            return None
        frames = max(self.n_frames) if self.n_frames is not None else None
        per_sheet = {}
        for pos, flat_idx in enumerate(indices):
            image_idx, idx = get_image_idx(flat_idx, self.slices, self.tiles)
            sheet = self.preload[image_idx]
            if sheet.dtype != np.uint8:
                return None
            n_slices = self.slices[image_idx]
            _, tiles_y = _n_tiles(sheet.shape, self.hr_res, self.stride)
            tile_idx = idx // n_slices
            y0 = tile_idx // tiles_y * self.stride
            x0 = tile_idx % tiles_y * self.stride
            res = idx % n_slices
            f0 = res if self.slide else res * (frames or 0)
            nf = frames if frames is not None else sheet.shape[0]
            per_sheet.setdefault(image_idx, []).append((pos, (f0 if frames is not None else 0, y0, x0), nf))

        nf_values = {nf for entries in per_sheet.values() for _, _, nf in entries}
        if len(nf_values) != 1:
            # mixed frame counts across sheets (n_frames=None): the batch
            # isn't rectangular -> host per-index fallback
            return None
        nf0 = nf_values.pop()
        out = np.empty((len(indices), nf0, self.hr_res, self.hr_res), dtype=np.uint8)
        for image_idx, entries in per_sheet.items():
            coords = np.asarray([c for _, c, _ in entries], dtype=np.int64)
            tiles = native.extract_tiles(self.preload[image_idx], coords, frames=nf0, size=self.hr_res)
            if tiles is None:
                return None
            for (pos, _, _), tile in zip(entries, tiles):
                out[pos] = tile
        return out

    def __len__(self):
        return sum(self.tiles[idx] * self.slices[idx] for idx in range(len(self.hr_files)))

    def __repr__(self):
        res = (
            f"low-res: {self.hr_res}"
            if self.is_lr
            else f"high-res: {self.hr_res}, low-res: {self.hr_res // self.lr_scale}"
        )
        return (
            f'SlidingDataset from path "{self.path}"\n'
            f"{len(self.hr_files)} files with {len(self)} total frame slices\n{res}"
        )

    def _get_name(self, idx):
        image_idx, idx = get_image_idx(idx, self.slices, self.tiles)
        return (
            f"{self.hr_files[image_idx].split('.')[0]}"
            f"_{idx // self.slices[image_idx]}_{idx % self.slices[image_idx]}"
        )


class PairedImageDataset(_DatasetBase):
    def __init__(
        self,
        hr_path: Path,
        lr_path: Path,
        hr_res: int = 512,
        lr_scale: int = 4,
        n_frames: list[int] = -1,
        extension: str = "tif",
        val_split: float = 1,
        rotation: bool = True,
        split_seed: int = None,
        transforms=None,
    ):
        """Testing dataset of real aligned high/low-resolution pairs, no
        crappification (reference: pssr/data.py:268-346)."""
        self.hr_path = _as_path(hr_path)
        self.lr_path = _as_path(lr_path)
        for p in [self.hr_path, self.lr_path]:
            _check_path(p)
        if self.hr_path == self.lr_path:
            warnings.warn("hr_path is equal to lr_path! Consider using ImageDataset instead.", stacklevel=2)

        self.hr_files = _glob_or_raise(self.hr_path, extension)
        self.lr_files = _glob_or_raise(self.lr_path, extension)
        if len(self.hr_files) != len(self.lr_files):
            raise FileNotFoundError(
                f"Mismatch between amounts of high-low-resolution images. Found "
                f"{len(self.hr_files)} high-resolution and {len(self.lr_files)} low-resolution images."
            )

        self.mode = "L"
        self.n_frames = get_n_frames(n_frames)

        self.slices, max_size = [], 0
        for image_idx in range(len(self.hr_files)):
            frames, size = probe_frames_and_size(self.hr_path, self.hr_files[image_idx])
            self.slices.append(1 if self.n_frames is None else frames // max(self.n_frames))
            max_size = max(size, max_size)

        self.val_idx = get_val_idx(self.slices, val_split, split_seed)
        self.is_lr = False
        self.crop_res = min(hr_res, max_size)
        self.extra_hr_files = None

        self.hr_res = hr_res
        self.lr_scale = lr_scale
        self.rotation = rotation
        self.transforms = transforms

    def __getitem__(self, idx, pp=False):
        if idx >= len(self):
            raise IndexError(
                f"Tried to retrieve invalid image. Index {idx} is not less than "
                f"{len(self)} total image frame slices."
            )
        is_val = idx in self.val_idx or pp
        image_idx, idx = get_image_idx(idx, self.slices)

        hr = load_image(
            self.hr_path,
            self.hr_files[image_idx],
            self.mode,
            self.n_frames[1] if self.n_frames is not None else None,
            self.slices[image_idx],
            idx,
        )
        lr = load_image(
            self.lr_path,
            self.lr_files[image_idx],
            self.mode,
            self.n_frames[0] if self.n_frames is not None else None,
            self.slices[image_idx],
            idx,
        )
        cur_rot = _random_rotation() if self.rotation and not is_val else False
        return transform_pair(hr, lr, self.hr_res, self.hr_res // self.lr_scale, cur_rot, self.transforms, self.n_frames)

    def __len__(self):
        return sum(self.slices)

    def __repr__(self):
        return (
            f'PairedImageDataset from paths "{self.hr_path}" and "{self.lr_path}"\n'
            f"{len(self.hr_files)} paired files with {len(self)} total frame slices\n"
            f"high-res: {self.hr_res}, low-res: {self.hr_res // self.lr_scale}"
        )

    def _get_name(self, idx):
        image_idx, idx = get_image_idx(idx, self.slices)
        return self.lr_files[image_idx].split(".")[0] + (f"_{idx}" if self.n_frames is not None else "")


class PairedSlidingDataset(_DatasetBase):
    def __init__(
        self,
        hr_path: Path,
        lr_path: Path,
        hr_res: int = 512,
        lr_scale: int = 4,
        overlap: int = 128,
        n_frames: list[int] = -1,
        slide: bool = False,
        stack: str = "TZ",
        extension: str = "tif",
        preload: bool = True,
        val_split: float = 1,
        rotation: bool = True,
        split_seed: int = None,
        transforms=None,
    ):
        """Testing dataset of paired high/low-resolution image sheets
        (reference: pssr/data.py:348-444)."""
        self.hr_path = _as_path(hr_path)
        self.lr_path = _as_path(lr_path)
        for p in [self.hr_path, self.lr_path]:
            _check_path(p)
        if self.hr_path == self.lr_path:
            warnings.warn("hr_path is equal to lr_path! Consider using SlidingDataset instead.", stacklevel=2)

        self.hr_files = _glob_or_raise(self.hr_path, extension)
        self.lr_files = _glob_or_raise(self.lr_path, extension)
        if len(self.hr_files) != len(self.lr_files):
            raise FileNotFoundError(
                f"Mismatch between amounts of high-low-resolution images. Found "
                f"{len(self.hr_files)} high-resolution and {len(self.lr_files)} low-resolution images."
            )

        overlap = 0 if overlap is None else overlap
        if not hr_res > overlap:
            raise ValueError(
                f"hr_res must be greater than overlap. Given values are {hr_res} and {overlap} respectively."
            )
        self.stride = hr_res - overlap
        self.stack = stack.upper()
        self.mode = "L"
        self.n_frames = get_n_frames(n_frames)
        self.slide = slide

        self.preload = preload_sheets(
            preload, [self.hr_path, self.lr_path], [self.hr_files, self.lr_files], self.mode, self.stack
        )

        self.tiles, self.slices = [], []
        for image_idx in range(len(self.hr_files)):
            image = (
                self.preload[0][image_idx]
                if self.preload
                else load_sheet(self.hr_path, self.hr_files[image_idx], self.stack, self.mode)
            )
            tiles_x, tiles_y = n_tiles(image.shape, hr_res, self.stride)
            self.tiles.append(tiles_x * tiles_y)
            self.slices.append(
                1
                if self.n_frames is None
                else (
                    (image.shape[0] - max(self.n_frames) + 1)
                    if slide
                    else (image.shape[0] // max(self.n_frames))
                )
            )

        self.val_idx = get_val_idx(self.slices, val_split, split_seed, self.tiles)
        self.is_lr = False
        self.crop_res = hr_res
        self.extra_hr_files = None

        self.hr_res = hr_res
        self.lr_scale = lr_scale
        self.rotation = rotation
        self.transforms = transforms

    def __getitem__(self, idx, pp=False):
        if idx >= len(self):
            raise IndexError(
                f"Tried to retrieve invalid image. Index {idx} is not less than "
                f"{len(self)} total image frame slices."
            )
        is_val = idx in self.val_idx or pp
        image_idx, idx = get_image_idx(idx, self.slices, self.tiles)

        hr_sheet = (
            self.preload[0][image_idx]
            if self.preload
            else load_sheet(self.hr_path, self.hr_files[image_idx], self.stack, self.mode)
        )
        lr_sheet = (
            self.preload[1][image_idx]
            if self.preload
            else load_sheet(self.lr_path, self.lr_files[image_idx], self.stack, self.mode)
        )

        hr = sliding_window(
            hr_sheet,
            self.hr_res,
            self.stride,
            self.n_frames[1] if self.n_frames is not None else None,
            self.slices[image_idx],
            idx,
            self.slide,
        )
        lr = sliding_window(
            lr_sheet,
            self.hr_res // self.lr_scale,
            self.stride // self.lr_scale,
            self.n_frames[0] if self.n_frames is not None else None,
            self.slices[image_idx],
            idx,
            self.slide,
        )
        cur_rot = _random_rotation() if self.rotation and not is_val else False
        return transform_pair(hr, lr, self.hr_res, self.hr_res // self.lr_scale, cur_rot, self.transforms, self.n_frames)

    def __len__(self):
        return sum(self.tiles[idx] * self.slices[idx] for idx in range(len(self.hr_files)))

    def __repr__(self):
        return (
            f'PairedSlidingDataset from paths "{self.hr_path}" and "{self.lr_path}"\n'
            f"{len(self.hr_files)} paired files with {len(self)} total frame slices\n"
            f"high-res: {self.hr_res}, low-res: {self.hr_res // self.lr_scale}"
        )

    def _get_name(self, idx):
        image_idx, idx = get_image_idx(idx, self.slices, self.tiles)
        return (
            f"{self.lr_files[image_idx].split('.')[0]}"
            f"_{idx // self.slices[image_idx]}_{idx % self.slices[image_idx]}"
        )


def preprocess_dataset(dataset, preprocess_hr: bool = False, out_dir: str = "preprocess"):
    """Materialize processed (crappified/cropped) frame slices to .tif files
    (reference: pssr/data.py:446-467). Rotation is disabled via pp=True.
    """
    os.makedirs(f"{out_dir}/lr", exist_ok=True)
    if preprocess_hr:
        os.makedirs(f"{out_dir}/hr", exist_ok=True)

    for idx in range(len(dataset)):
        hr, lr = dataset.__getitem__(idx, pp=True)
        hr = np.asarray(hr, dtype=np.uint8)
        lr = np.asarray(lr, dtype=np.uint8)

        tiff.imwrite(f"{out_dir}/lr/{dataset._get_name(idx)}.tif", lr)
        if preprocess_hr:
            tiff.imwrite(f"{out_dir}/hr/{dataset._get_name(idx)}.tif", hr)
