#!/bin/bash
# Tiled-inference throughput for all three model families (VERDICT r1 #9).
# Runs bench.py BENCH_MODE=infer sequentially; writes infer_table.jsonl.
set -u
cd "$(dirname "$0")/.."
: > experiments/infer_table.jsonl
for m in resunet rdresunet swinir; do
  echo "=== $m ===" >&2
  BENCH_MODE=infer BENCH_MODEL=$m timeout 3000 python bench.py \
    2>>experiments/infer_table.err | tail -1 >> experiments/infer_table.jsonl
done
cat experiments/infer_table.jsonl
