"""Finish a convergence-gate artifact from per-seed checkpoints.

quality_fused.py writes quality_fused_{family}_partial.json after each
completed seed (and the per-seed run records to its log); a run killed at
a round boundary keeps its completed legs.  This script merges one or
more partial files (disjoint seed sets, e.g. a seed-0 run killed mid-seed
1 plus a GATE_SEEDS=1,2 rerun), recomputes the mean/max deltas, writes
the final quality_fused_{family}.json, and asserts the budget — the same
criterion quality_fused.main() applies.

Usage: python experiments/merge_gate_partials.py swinir partial1.json [partial2.json ...]
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BUDGET_DB = 0.05


def main():
    family = sys.argv[1]
    runs = {}
    epochs = None
    for path in sys.argv[2:]:
        with open(path) as f:
            part = json.load(f)
        assert part["family"] == family, (path, part["family"])
        assert epochs is None or part["epochs"] == epochs
        epochs = part["epochs"]
        for r in part["runs"]:
            assert r["seed"] not in runs, f"duplicate seed {r['seed']}"
            runs[r["seed"]] = r
    runs = [runs[s] for s in sorted(runs)]
    deltas = [r["delta_db"] for r in runs]
    # per-family criterion must mirror quality_fused.main() exactly
    from quality_fused import RECIPES

    criterion = RECIPES[family].get("criterion", "two_sided")
    sem = float(np.std(deltas, ddof=1) / np.sqrt(len(deltas))) if len(deltas) > 1 else 0.0
    out = {
        "family": family,
        "epochs": epochs,
        "seeds": sorted(r["seed"] for r in runs),
        "runs": runs,
        "mean_delta_db": round(float(np.mean(deltas)), 4),
        "mean_abs_delta_db": round(float(np.mean(np.abs(deltas))), 4),
        "max_abs_delta_db": round(float(np.max(np.abs(deltas))), 4),
        "sem_db": round(sem, 4),
        "criterion": criterion,
        "budget_db": BUDGET_DB,
        "merged_from": [os.path.basename(p) for p in sys.argv[2:]],
    }
    print(json.dumps(out, indent=1), flush=True)
    # validate BEFORE writing (advisor r4): a 1-seed or budget-violating
    # merge must not leave a final-looking quality_fused_{family}.json
    assert len(runs) >= 3, f"only {len(runs)} seeds merged; the gate needs >= 3"
    if criterion == "two_sided":
        assert abs(out["mean_delta_db"]) <= BUDGET_DB, (
            f"mean endpoint PSNR delta {out['mean_delta_db']} dB exceeds the "
            f"{BUDGET_DB} dB budget"
        )
    else:  # no_harm — see quality_fused.RECIPES
        bound = -(BUDGET_DB + 2 * sem)
        assert out["mean_delta_db"] >= bound, (
            f"mean endpoint PSNR delta {out['mean_delta_db']} dB is below the "
            f"no-harm bound {bound:.4f}"
        )
    with open(os.path.join(HERE, f"quality_fused_{family}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
