"""The TPU input pipeline: host loader threads feed raw uint8 HR patches into
a double-buffered host->HBM prefetcher; augmentation, PIL-matched downscale
and crappification run fused on device inside the jitted train step.

This replaces the reference's DataLoader-worker crappification
(reference: pssr/train.py:75-76 feeding pssr/data.py:471-495) with an
HBM-resident transform so patch degradation never stalls the TPU.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.degrade import to_device_fn
from ..ops.resize import resize_bilinear
from .indexing import slice_center


def device_augment(key, x):
    """Per-sample random rot90/flip, matching the host distribution
    (reference: pssr/data.py:108 — p=0.5 rot90, then always one of
    flip-H / flip-W / flip-both uniformly).  x: (C, H, W) float."""
    k1, k2 = jax.random.split(key)
    rot = jax.random.bernoulli(k1)
    x = jax.lax.cond(rot, lambda v: jnp.rot90(v, axes=(1, 2)), lambda v: v, x)
    choice = jax.random.randint(k2, (), 0, 3)
    x = jax.lax.switch(
        choice,
        [
            lambda v: jnp.flip(v, axis=1),
            lambda v: jnp.flip(v, axis=2),
            lambda v: jnp.flip(v, axis=(1, 2)),
        ],
        x,
    )
    return x


def make_device_gen_pair(lr_scale: int, crappifier, n_frames=None, augment: bool = True,
                         host_fallback: bool = False):
    """Build the jittable device-side equivalent of the host ``gen_pair``
    (reference: pssr/data.py:471-495): aug -> PIL-matched downscale (MXU
    matmuls) -> crappify -> uint8 rounding. Returns
    ``fn(key, hr_u8_batch) -> (hr_f32, lr_f32)`` for (B, C, H, W) input.

    Custom host crappifiers (no device lowering) are supported with
    ``host_fallback=True``: augmentation and downscale stay fused on device
    (keeping the uint8 transfer fast path) and only the crappify step runs
    on host through ``jax.experimental.io_callback``.
    """
    crappify_fn = to_device_fn(crappifier) if crappifier is not None else None
    host_crappifier = None
    if crappifier is not None and crappify_fn is None:
        if not host_fallback:
            raise ValueError(
                f"Crappifier {type(crappifier).__name__} has no device lowering; "
                "use host_fallback=True in the loader or implement a device fn."
            )
        host_crappifier = crappifier

    def _host_crappify(lr_np):
        # same semantics as the host path (data/io.py gen_pair:188-190):
        # crappify per sample on the uint8-rounded LR
        from ..crappifiers import Crappifier

        lr_np = np.asarray(lr_np)
        out = np.empty_like(lr_np, dtype=np.float32)
        for i in range(lr_np.shape[0]):
            if isinstance(host_crappifier, Crappifier):
                sample = host_crappifier.crappify(lr_np[i])
            else:
                sample = host_crappifier(lr_np[i])
            out[i] = np.asarray(sample, dtype=np.float32)
        return out

    def gen_pair(key, hr_u8, key_block=None):
        """``key_block=(offset, total)``: this call holds rows
        [offset, offset+B) of a ``total``-sample global batch — per-sample
        keys are split from the GLOBAL counts and sliced, so a shard_map
        shard degrades bit-identically to the same rows in the
        single-program path (``offset`` may be traced, e.g.
        ``axis_index * local_B``)."""
        b = hr_u8.shape[0]

        def _keys(k):
            if key_block is None:
                return jax.random.split(k, b)
            offset, total = key_block
            return jax.lax.dynamic_slice_in_dim(jax.random.split(k, total), offset, b, 0)

        if augment:
            # Augment in uint8: rot90/flip are pure permutations, so they
            # commute with astype bit-exactly — and the vmapped cond/switch
            # materializes every branch, so doing it pre-convert moves 4x
            # fewer bytes (the profiled "f32 NCHW 512^2 boundary" copies).
            k_aug, key = jax.random.split(key)
            hr_u8 = jax.vmap(device_augment)(_keys(k_aug), hr_u8)
        hr = hr_u8.astype(jnp.float32)

        lr_res = hr.shape[-1] // lr_scale
        lr = resize_bilinear(hr, lr_res, lr_res)
        lr = jnp.clip(jnp.round(lr), 0, 255)  # uint8 rounding, as PIL produces

        if crappify_fn is not None:
            lr = jax.vmap(crappify_fn)(_keys(key), lr)
            lr = jnp.clip(jnp.round(lr), 0, 255)
        elif host_crappifier is not None:
            from jax.experimental import io_callback

            lr = io_callback(_host_crappify, jax.ShapeDtypeStruct(lr.shape, jnp.float32), lr)
            lr = jnp.clip(jnp.round(lr), 0, 255)

        if n_frames is not None and n_frames[0] != n_frames[1]:
            if not n_frames[1] > hr.shape[-3]:
                hr = slice_center(hr, n_frames[1])
            if not n_frames[0] > lr.shape[-3]:
                lr = slice_center(lr, n_frames[0])
        return hr, lr

    return gen_pair


class PatchLoader:
    """Threaded host loader yielding padded uint8 HR patch batches.

    Yields ``(batch_u8 (B, C, H, W), n_valid)`` where the batch is padded up
    to ``batch_size`` by repeating the last sample; ``n_valid`` marks the
    real count so the train step can slice exactly (loss parity with the
    reference's variable last batch).

    ``local_slice=(start, stop)`` makes this a multi-host feed: the loader
    yields only rows [start, stop) of each (padded) GLOBAL batch — the rows
    this process contributes via ``put_global_batch`` — while ``n_valid``
    stays global.  All processes must iterate identically-seeded samplers.
    """

    def __init__(self, dataset, sampler, batch_size: int, num_workers: int = 4,
                 pad_to: int = None, local_slice=None):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.pad_to = batch_size if pad_to is None else pad_to
        self.local_slice = (0, self.pad_to) if local_slice is None else tuple(local_slice)

    def __len__(self):
        return (len(self.sampler) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = list(self.sampler)
        batch_fn = getattr(self.dataset, "hr_patch_batch", None)
        lo, hi = self.local_slice
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # pipeline two batches ahead
            pending = []
            for start in range(0, len(order), self.batch_size):
                idx = order[start : start + self.batch_size]
                # this process's rows of the padded global batch (padding
                # repeats the last real sample, as the global batch would)
                rows = [idx[min(r, len(idx) - 1)] for r in range(lo, hi)]
                if batch_fn is not None:
                    # native parallel tile gather (preloaded sliding sheets)
                    fut = pool.submit(self._load_batch, batch_fn, rows)
                    pending.append((fut, len(idx)))
                else:
                    pending.append((pool.map(self.dataset.hr_patch, rows), len(idx)))
                if len(pending) > 2:
                    yield self._finalize(*pending.pop(0))
            while pending:
                yield self._finalize(*pending.pop(0))

    def _load_batch(self, batch_fn, idx):
        batch = batch_fn(idx)
        if batch is not None:
            return batch
        return [self.dataset.hr_patch(i) for i in idx]

    def _finalize(self, patches, n_valid):
        if hasattr(patches, "result"):  # Future from the batched gather path
            patches = patches.result()
        if isinstance(patches, np.ndarray):
            return patches, n_valid
        return np.stack(list(patches)), n_valid


def prefetch_to_device(iterator, sharding=None, depth: int = 2):
    """Double-buffered host->device transfer: overlaps H2D copies of the next
    batches with device compute on the current one.

    The producer thread shuts down promptly when the consumer abandons the
    generator mid-epoch (e.g. an abort callback raising InterruptedError):
    puts use a timeout and check a stop flag, so no thread lingers blocked.
    """
    q = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()

    def _put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        # Loader errors (corrupt file, tile-extraction ValueError, ...) are
        # forwarded to the consumer and re-raised there — NOT treated as a
        # clean end-of-epoch, which would silently train on truncated data.
        from ..parallel.distributed import put_global_batch

        try:
            for batch, n_valid in iterator:
                arr = put_global_batch(batch, sharding)
                if not _put((arr, n_valid)):
                    return
        except BaseException as exc:  # noqa: BLE001 - forwarded, not swallowed
            _put(exc)
        finally:
            _put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
