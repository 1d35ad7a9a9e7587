"""Merge the xplane per-op exclusive times with the optimized-HLO
metadata (source_file:line + backend_config emitter hints) to produce a
per-source-site cost table for the canonical train step.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python
  experiments/analyze_attrib.py <xplane.pb> <hlo.txt> [--steps N]
"""

import collections
import os
import re
import sys

sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")

from tsl.profiler.protobuf import xplane_pb2  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

META_RE = re.compile(
    r"^\s+%(?P<name>[\w.\-]+) = .*?metadata=\{(?P<meta>[^}]*)\}", re.M)
SRC_RE = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
OP_RE = re.compile(r'op_name="([^"]+)"')


def load_hlo_map(path):
    """op name -> (source_file:line, op_name) from the HLO text."""
    out = {}
    with open(path) as f:
        for line in f:
            m = META_RE.match(line)
            if not m:
                continue
            meta = m.group("meta")
            src = SRC_RE.search(meta)
            opn = OP_RE.search(meta)
            site = None
            if src:
                site = f"{os.path.basename(os.path.dirname(src.group(1)))}/{os.path.basename(src.group(1))}:{src.group(2)}"
            out[m.group("name")] = (site or "?", opn.group(1) if opn else "?")
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = 3
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--steps":
            steps = int(argv[i + 1]); args = [x for x in args if x != argv[i + 1]]
    xplane_path, hlo_path = args[0], args[1]
    hlo = load_hlo_map(hlo_path)
    print(f"hlo map: {len(hlo)} ops", flush=True)

    space = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m.id: m for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            per_site = collections.Counter()
            per_site_n = collections.Counter()
            unmatched = collections.Counter()
            total = 0
            for ev in line.events:
                md = meta.get(ev.metadata_id)
                name = (md.name if md else "?").split("=")[0].lstrip("%").strip()
                total += ev.duration_ps
                site = hlo.get(name)
                if site is None:
                    unmatched[re.sub(r"[._]\d+$", "", name)] += ev.duration_ps
                    continue
                per_site[site[0]] += ev.duration_ps
                per_site_n[site[0]] += 1
            print(f"total {total/1e9/steps:.3f} ms/step; "
                  f"unmatched {sum(unmatched.values())/1e9/steps:.3f} ms")
            print("per source site (ms/step, events):")
            for site, ps in per_site.most_common(45):
                print(f"  {ps/1e9/steps:7.3f} x{per_site_n[site]//steps:<4d} {site}")
            print("top unmatched families (ms/step):")
            for fam, ps in unmatched.most_common(15):
                print(f"  {ps/1e9/steps:7.3f} {fam}")


if __name__ == "__main__":
    main()
