"""Tracked tiled-inference benchmark artifact (VERDICT r4 #7).

BASELINE.md's north star names tiled inference (tiles/sec, the
SlidingDataset predict hot path) as a first-class metric; bench.py's
BENCH_MODE=infer computes it but no artifact was ever committed.  This
runner records ResUNet / RDResUNet / SwinIR x4 batch-16 bf16 tiles/sec (plus
the batch-1 reference-architecture baseline ratio, the reference's
default predict path — pssr/predict.py:39 batch_size None=1) into
experiments/bench_infer_r{N}.json, tracked round over round.

Run: python experiments/bench_infer.py [round_tag]
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r5"
    out = {"recorded": time.strftime("%Y-%m-%d %H:%M:%S"), "protocol": "bench.py BENCH_MODE=infer (batch 16 bf16 128->512; vs_baseline = batched tiles/sec over batch-1 forwards/sec)"}
    for model in ("resunet", "rdresunet", "swinir"):
        env = dict(os.environ, BENCH_MODE="infer", BENCH_MODEL=model)
        env.setdefault("JAX_CACHE_DIR", "/tmp/jax_cache")
        res = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True, text=True, env=env, timeout=2400,
        )
        line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
        out[model] = json.loads(line)
        print(model, line, flush=True)
    path = os.path.join(HERE, f"bench_infer_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
