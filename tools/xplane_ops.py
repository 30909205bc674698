"""Parse a jax.profiler xplane.pb and print per-op device time, sorted.

Usage:  python tools/xplane_ops.py /tmp/jaxtrace [top_n]

Aggregates event durations per event name on every device plane (TPU ops
land on '/device:TPU:0' planes; each XLA op is one event).  This is the
round-2 searchsorted-hunt workflow, committed as a tool (docs/PERF.md
"found via an xplane trace")."""
import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(path_or_dir):
    files = (
        [path_or_dir]
        if path_or_dir.endswith(".pb")
        else glob.glob(f"{path_or_dir}/**/*.xplane.pb", recursive=True)
    )
    if not files:
        raise SystemExit(f"no xplane.pb under {path_or_dir}")
    space = xplane_pb2.XSpace()
    with open(sorted(files)[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def per_op(space, plane_filter=("TPU", "tpu")):
    out = []
    for plane in space.planes:
        if plane_filter and not any(k in plane.name for k in plane_filter):
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                a = agg[name]
                a[0] += ev.duration_ps / 1e6  # us
                a[1] += 1
        out.append((plane.name, agg))
    return out


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    space = load(path)
    planes = per_op(space)
    if not planes:
        planes = per_op(space, plane_filter=None)
    for name, agg in planes:
        total = sum(v[0] for v in agg.values())
        print(f"== plane {name}: {len(agg)} op names, {total/1e3:.1f} ms total")
        for op, (us, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
            print(f"  {us/1e3:9.3f} ms  x{cnt:<6d} {op[:110]}")


if __name__ == "__main__":
    main()
