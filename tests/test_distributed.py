"""Multi-host feeding tests (SURVEY.md §2.4 comm row): per-process batch
slicing, loader partitioning, and a REAL two-process run over localhost
(jax.distributed CPU collectives) training through the full
train_paired path with ``jax.make_array_from_process_local_data``."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from _util import make_tifs, get_shape


def test_local_batch_slice_arithmetic():
    from pssr2_tpu.parallel.distributed import local_batch_slice

    assert local_batch_slice(16, process_index=0, process_count=4) == (0, 4)
    assert local_batch_slice(16, process_index=3, process_count=4) == (12, 16)
    # single process: the whole batch
    assert local_batch_slice(16, process_index=0, process_count=1) == (0, 16)


def test_patchloader_local_slices_partition_global(tmp_path):
    """Two identically-seeded local-slice loaders reproduce exactly the
    rows of the global padded batch (incl. the partial final batch)."""
    from pssr2_tpu.data import ImageDataset
    from pssr2_tpu.data.indexing import RandomIterIdx
    from pssr2_tpu.data.pipeline import PatchLoader

    make_tifs(tmp_path / "images", get_shape(32, batch=7))
    dataset = ImageDataset(tmp_path / "images", hr_res=32, val_split=1)
    idx = list(range(len(dataset)))

    def sampler():
        return RandomIterIdx(idx, rng=np.random.default_rng(11))

    global_loader = PatchLoader(dataset, sampler(), batch_size=4, num_workers=2)
    half0 = PatchLoader(dataset, sampler(), 4, num_workers=2, local_slice=(0, 2))
    half1 = PatchLoader(dataset, sampler(), 4, num_workers=2, local_slice=(2, 4))

    for (gb, gn), (b0, n0), (b1, n1) in zip(global_loader, half0, half1):
        assert gn == n0 == n1
        np.testing.assert_array_equal(np.concatenate([b0, b1]), gb)
        assert b0.shape[0] == b1.shape[0] == 2


def test_pairbatchloader_local_slice(tmp_path):
    """The host-fallback loader partitions the same way (hr rows match)."""
    from pssr2_tpu.data import ImageDataset
    from pssr2_tpu.data.indexing import RandomIterIdx
    from pssr2_tpu.train import _PairBatchLoader

    make_tifs(tmp_path / "images", get_shape(32, batch=5))
    dataset = ImageDataset(tmp_path / "images", hr_res=32, val_split=1, rotation=False)
    idx = list(range(len(dataset)))

    def sampler():
        return RandomIterIdx(idx, rng=np.random.default_rng(5))

    global_loader = _PairBatchLoader(dataset, sampler(), 4, num_workers=2)
    half0 = _PairBatchLoader(dataset, sampler(), 4, num_workers=2, local_slice=(0, 2))
    half1 = _PairBatchLoader(dataset, sampler(), 4, num_workers=2, local_slice=(2, 4))

    for ((ghr, _), _, gn), ((h0, _), _, n0), ((h1, _), _, n1) in zip(global_loader, half0, half1):
        assert gn == n0 == n1
        np.testing.assert_array_equal(np.concatenate([h0, h1]), ghr)


@pytest.mark.slow
def test_two_process_train_paired(tmp_path):
    """REAL two-process training over localhost: each process feeds its
    local_batch_slice rows, the global array is assembled with
    make_array_from_process_local_data, and both processes converge to the
    same validation loss."""
    make_tifs(tmp_path / "images", get_shape(32, batch=8))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path / "images")],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    vals = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert lines, out[-2000:]
        vals.append(float(lines[0].split("val=")[1]))
    assert np.isfinite(vals[0])
    assert vals[0] == pytest.approx(vals[1], abs=1e-9)
