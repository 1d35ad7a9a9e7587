"""Cross-framework training-parity test (slow): the JAX train path and a
torch twin of the reference architecture, trained from identical weights on
identical data, must land within the 0.1 dB PSNR budget (BASELINE.md).

A reduced setting of experiments/train_parity.py (which documents the full
500-step run); the dynamics gap, if any, shows up well before 150 steps.
"""

import pytest

from experiments.train_parity import run_parity


@pytest.mark.slow
def test_training_matches_torch_reference_dynamics():
    psnr_jax, psnr_torch = run_parity(n_steps=150, n_images=24, batch_size=8, log=lambda *_: None)
    assert abs(psnr_jax - psnr_torch) <= 0.1, (psnr_jax, psnr_torch)
    assert psnr_jax > 20  # sanity: training actually improved the phantoms
