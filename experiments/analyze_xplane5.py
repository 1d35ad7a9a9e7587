"""Top individual HLO ops from an xplane: name, count, ms/step, source.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python
       experiments/analyze_xplane5.py <xplane.pb> [--steps N] [--top K]
       [--match SUBSTR]
"""

import collections
import os
import sys

sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")

from tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps, top, match = 3, 60, None
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
        if a.startswith("--top="):
            top = int(a.split("=")[1])
        if a.startswith("--match="):
            match = a.split("=", 1)[1]
    path = args[0]
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        sid = {v.name: k for k, v in plane.stat_metadata.items()}
        s_src, s_cat = sid.get("source"), sid.get("hlo_category")
        agg = collections.defaultdict(float)
        cnt = collections.Counter()
        meta = {}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                agg[md.name] += ev.duration_ps / 1e9 / steps
                cnt[md.name] += 1
                if md.name not in meta:
                    src = cat = None
                    for s in md.stats:
                        if s.metadata_id == s_src:
                            src = s.str_value
                        elif s.metadata_id == s_cat:
                            cat = s.str_value
                    meta[md.name] = (src, cat)
        rows = sorted(agg.items(), key=lambda kv: -kv[1])
        shown = 0
        for name, ms in rows:
            if match and match not in name:
                continue
            src, cat = meta[name]
            src = (src or "").split("/")[-1]
            print(f"{ms:8.3f} x{cnt[name] // steps:<3} {cat or '?':<22} {name[:70]:<70} {src}")
            shown += 1
            if shown >= top:
                break
        break


if __name__ == "__main__":
    main()
