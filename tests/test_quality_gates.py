"""CI re-checks of the TPU-measured quality-gate artifacts.

The gates themselves run on hardware (experiments/int8_quality.py,
experiments/quality_fused.py — each asserts its budget at run time);
these tests make the committed artifacts load-bearing: if a regression is
ever committed (or an artifact edited without re-running the gate into a
passing state), the suite goes red.  Advisor r3: the int8 gate previously
only *recorded* deltas.
"""

import json
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
EXP = os.path.join(os.path.dirname(HERE), "experiments")


def _load(name, required=False):
    """Load a gate artifact.  ``required=True`` marks paths that are ON by
    default in shipping trainers — a missing artifact there is a FAILURE,
    not a skip (VERDICT r4 #3: a fresh checkout must go red if a
    shipping-path gate is absent, the exact vacuity the r4 SwinIR bug
    exposed).  Keep skip only for genuinely optional paths (int8 is
    opt-in via -q8)."""
    path = os.path.join(EXP, name)
    if not os.path.exists(path):
        if required:
            pytest.fail(
                f"{name} is missing but gates a default-ON fused path; "
                f"run experiments/quality_fused.py and commit the artifact"
            )
        pytest.skip(f"{name} not generated yet (optional hardware gate)")
    with open(path) as f:
        return json.load(f)


def test_int8_quality_gate():
    """Post-training int8 must cost <= 0.01 dB PSNR per family
    (experiments/int8_quality.py protocol; delta_db = fp - int8)."""
    results = _load("int8_quality.json")
    assert set(results) >= {"ResUNet", "ResUNetA", "RDResUNet"}
    for family, row in results.items():
        assert row["delta_db"] <= 0.01, (family, row)
        # and int8 must actually track the fp model, not just the metric
        assert row["int8_vs_fp_psnr"] >= 40, (family, row)


@pytest.mark.parametrize("family", ["swinir", "rdres", "resunet"])
def test_fused_vjp_convergence_gate(family):
    """Convergence-endpoint PSNR of the fused-VJP training paths
    (swinblock / rdtail / convchain Pallas kernels) must match the
    XLA-autodiff twin to <= 0.05 dB MEAN over seeds after the full
    220-epoch quality_demo protocol (experiments/quality_fused.py;
    VERDICT r3 #2, r4 #5).  Mean over seeds because single-seed endpoint
    deltas are fp-reorder chaos (identical-math twins spread
    0.01-0.11 dB/seed — experiments/train_parity.md); a systematic
    kernel divergence (the bf16-loss NaN precedent) survives
    averaging."""
    out = _load(f"quality_fused_{family}.json", required=True)
    assert out["epochs"] >= 200, out
    assert len(out["runs"]) >= 3, out
    if out.get("criterion", "two_sided") == "two_sided":
        assert abs(out["mean_delta_db"]) <= out["budget_db"], out
    else:
        # chaos-regime endpoint (see quality_fused.py RECIPES): the task's
        # own fp-reorder spread dwarfs the budget, so the endpoint gate
        # asserts statistical no-harm; the high-power certification is the
        # deterministic gradient-bias gate checked below.
        bound = -(out["budget_db"] + 2 * out["sem_db"])
        assert out["mean_delta_db"] >= bound, out
    # every endpoint must be a trained model, not a divergent run
    for r in out["runs"]:
        assert r["fused"]["val_psnr"] > 20 and r["unfused"]["val_psnr"] > 20, r
        assert r["fused"]["kernel_calls"] > 0, r  # gate is non-vacuous


@pytest.mark.parametrize("family", ["resunet", "rdres", "swinir"])
def test_grad_bias_gate(family):
    """The deterministic gradient-bias gate for every default-ON fused
    training path at its SHIPPING flagship config
    (experiments/grad_bias.py): a kernel-math bug is large AND
    directional (the r4 SwinIR roll bug: t ~ 100 at bias_over_grad
    0.045 on normal-scale leaves), while the benign classes —
    architecture fp-chaos (large but t ~ 1), precision-class kernel
    rounding (directional but <= 0.2%), and softmax-invariance
    cancellation residuals (gmag 5+ orders below scale) — each miss a
    prong.  The artifact must record ZERO leaves hitting both prongs.
    This is the high-power complement to the endpoint gates above."""
    out = _load(f"grad_bias_{family}.json", required=True)
    assert out["violations"] == [], out["violations"]
    assert out["n_asserted"] > 10, out
    # thresholds must not have drifted above the calibration (r4 bug at
    # t~100/0.045 must stay detectable with wide margin)
    assert out["t_budget"] <= 20 and out["bog_budget"] <= 0.01, out
