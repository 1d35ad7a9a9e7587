"""Parse a jax.profiler xplane capture and print per-op time tables.

Workaround for the broken tensorboard_plugin_profile converter in this
image: load tensorflow's bundled xplane_pb2 directly (pure-python protobuf
impl) and aggregate XEvent durations per event-metadata name on the
device planes.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python
       experiments/analyze_xplane.py [xplane.pb]
"""

import collections
import glob
import os
import sys

sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")

from tsl.profiler.protobuf import xplane_pb2  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    if len(sys.argv) > 1:
        paths = sys.argv[1:]
    else:
        paths = sorted(
            glob.glob(os.path.join(HERE, "profile_out", "**", "*.xplane.pb"), recursive=True)
        )
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        print(f"== {path}")
        for plane in space.planes:
            total_line_ps = collections.Counter()
            per_op = collections.Counter()
            per_op_count = collections.Counter()
            meta = {m.id: m for m in plane.event_metadata.values()}
            n_events = 0
            for line in plane.lines:
                for ev in line.events:
                    n_events += 1
                    md = meta.get(ev.metadata_id)
                    name = md.name if md else f"id{ev.metadata_id}"
                    per_op[name] += ev.duration_ps
                    per_op_count[name] += 1
                    total_line_ps[line.name] += ev.duration_ps
            if not n_events:
                continue
            print(f"-- plane: {plane.name}  events={n_events}")
            for lname, ps in total_line_ps.most_common(8):
                print(f"   line {lname}: {ps/1e9:.3f} ms total")
            print(f"   top ops by total duration:")
            for name, ps in per_op.most_common(40):
                print(f"   {ps/1e9:9.3f} ms  x{per_op_count[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
