"""Sharper xplane analysis: exclusive per-op times from the device
"XLA Ops" line only (async copy-start spans overlap and mislead),
aggregated per step and categorized (conv / dot / fusion / copy /
reduce / other), with a cumulative table.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python
       experiments/analyze_xplane2.py [xplane.pb] [--steps N]
"""

import collections
import glob
import os
import re
import sys

sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")

from tsl.profiler.protobuf import xplane_pb2  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def categorize(name: str) -> str:
    # match on the op's OWN name only — matching the full display string
    # misclassified every fusion consuming a %copy-done operand as "copy"
    # (inflated the copy category ~8x on the r3 canonical-step profile)
    head = name.split("=")[0].lstrip("%").strip()
    if head.startswith("convolution") or "convolution" in head:
        return "conv"
    if head.startswith("dot") or "dot_fusion" in head:
        return "dot"
    if head.startswith("copy") or head.startswith("bitcast"):
        return "copy"
    if head.startswith("fusion") or "_fusion" in head:
        return "fusion"
    if head.startswith("reduce") or "reduce" in head:
        return "reduce"
    if head.startswith("slice") or head.startswith("dynamic"):
        return "slice"
    if head.startswith("all-") or head.startswith("collective"):
        return "collective"
    if head.startswith("custom-call") or head.startswith("_lambda"):
        return "custom-call"
    return "other"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = 3
    for i, a in enumerate(sys.argv[1:]):
        if a == "--steps":
            steps = int(sys.argv[1:][i + 1])
            args = [x for x in args if x != sys.argv[1:][i + 1]]
    paths = args or sorted(
        glob.glob(os.path.join(HERE, "profile_out", "**", "*.xplane.pb"), recursive=True)
    )
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        print(f"== {path}  (divide by {steps} steps)")
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = {m.id: m for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                per_op = collections.Counter()
                per_op_count = collections.Counter()
                per_cat = collections.Counter()
                total = 0
                for ev in line.events:
                    md = meta.get(ev.metadata_id)
                    name = md.name if md else f"id{ev.metadata_id}"
                    per_op[name] += ev.duration_ps
                    per_op_count[name] += 1
                    per_cat[categorize(name)] += ev.duration_ps
                    total += ev.duration_ps
                print(f"-- plane {plane.name}: XLA Ops exclusive total "
                      f"{total/1e9:.3f} ms = {total/1e9/steps:.3f} ms/step, "
                      f"{sum(per_op_count.values())} events "
                      f"({sum(per_op_count.values())//steps}/step), "
                      f"{len(per_op)} distinct ops")
                print("   by category (ms/step):")
                for cat, ps in per_cat.most_common():
                    print(f"     {cat:10s} {ps/1e9/steps:7.3f}")
                print("   top ops (ms/step, count/step):")
                shown = 0
                for name, ps in per_op.most_common(60):
                    print(f"   {ps/1e9/steps:7.3f} ms x{per_op_count[name]//steps:<3d} {name[:140]}")
                    shown += ps
                print(f"   [top 60 = {shown/1e9/steps:.3f} ms/step of {total/1e9/steps:.3f}]")


if __name__ == "__main__":
    main()
