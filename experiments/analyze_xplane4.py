"""Source-line attribution straight from the xplane: the device plane's
XEventMetadata carries per-op ``source`` / ``hlo_category`` stats, so no
matching HLO dump is needed (unlike analyze_attrib.py).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python
       experiments/analyze_xplane4.py [xplane.pb] [--steps N] [--top K]
"""

import collections
import glob
import os
import sys

sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")

from tsl.profiler.protobuf import xplane_pb2  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = 3
    top = 45
    for a in sys.argv[1:]:
        if a.startswith("--steps"):
            steps = int(a.split("=")[1])
        if a.startswith("--top"):
            top = int(a.split("=")[1])
    if args:
        path = args[0]
    else:
        paths = sorted(
            glob.glob(os.path.join(HERE, "profile_out", "**", "*.xplane.pb"), recursive=True)
        )
        path = paths[-1]
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        sid = {v.name: k for k, v in plane.stat_metadata.items()}
        s_src, s_cat = sid.get("source"), sid.get("hlo_category")
        by_src = collections.Counter()
        by_cat = collections.Counter()
        cnt_src = collections.Counter()
        total = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ps / 1e9 / steps
                total += dur
                md = plane.event_metadata[ev.metadata_id]
                src = cat = None
                for s in md.stats:
                    if s.metadata_id == s_src:
                        src = s.str_value
                    elif s.metadata_id == s_cat:
                        cat = s.str_value
                by_src[src or "<none>"] += dur
                cnt_src[src or "<none>"] += 1
                by_cat[cat or "<none>"] += dur
        print(f"== {path} ({plane.name}, /{steps} steps): total {total:.3f} ms/step")
        print("-- by hlo_category:")
        for k, v in by_cat.most_common(20):
            print(f"   {v:7.3f}  {k}")
        print(f"-- by source (top {top}):")
        for k, v in by_src.most_common(top):
            print(f"   {v:7.3f}  x{cnt_src[k] // steps:<4} {k}")
        break


if __name__ == "__main__":
    main()
