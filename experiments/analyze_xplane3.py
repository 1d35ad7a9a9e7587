"""Tail analysis: aggregate XLA-op exclusive times by canonical name
family (digits stripped), splitting head ops (>=cutoff ms) from the tail,
so the sub-0.2ms swarm becomes attributable.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python
       experiments/analyze_xplane3.py [xplane.pb] [--steps N] [--cutoff MS]
"""

import collections
import glob
import os
import re
import sys

sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")

from tsl.profiler.protobuf import xplane_pb2  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def family(name: str) -> str:
    head = name.split("=")[0].lstrip("%").strip()
    return re.sub(r"[._]\d+$", "", head)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps, cutoff = 3, 0.18
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--steps":
            steps = int(argv[i + 1]); args = [x for x in args if x != argv[i + 1]]
        if a == "--cutoff":
            cutoff = float(argv[i + 1]); args = [x for x in args if x != argv[i + 1]]
    paths = args or sorted(
        glob.glob(os.path.join(HERE, "profile_out", "**", "*.xplane.pb"), recursive=True)
    )
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        print(f"== {path} (/{steps} steps, head cutoff {cutoff} ms)")
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = {m.id: m for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                per_op = collections.Counter()
                names = {}
                for ev in line.events:
                    md = meta.get(ev.metadata_id)
                    name = md.name if md else f"id{ev.metadata_id}"
                    per_op[name] += ev.duration_ps
                    names.setdefault(name, md.display_name if md and md.display_name else name)
                head_ps = tail_ps = 0
                tail_fam = collections.Counter()
                tail_fam_n = collections.Counter()
                tail_example = {}
                for name, ps in per_op.items():
                    ms = ps / 1e9 / steps
                    if ms >= cutoff:
                        head_ps += ps
                    else:
                        tail_ps += ps
                        f_ = family(name)
                        tail_fam[f_] += ps
                        tail_fam_n[f_] += 1
                        if f_ not in tail_example or ps > per_op[tail_example[f_]]:
                            tail_example[f_] = name
                print(f"head {head_ps/1e9/steps:.3f} ms/step, tail {tail_ps/1e9/steps:.3f} ms/step")
                print("tail families (ms/step, distinct ops):")
                for f_, ps in tail_fam.most_common(40):
                    ex = names.get(tail_example[f_], "")[:110]
                    print(f"  {ps/1e9/steps:7.3f} x{tail_fam_n[f_]:<4d} {f_:40s} e.g. {ex}")


if __name__ == "__main__":
    main()
