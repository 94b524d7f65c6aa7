"""Timeline occupancy analysis of a TPU xplane trace: per line of the
device plane, the UNION of event intervals (de-overlapped), split into
compute vs async-copy events. Answers "is the step stalled on copies or
busy computing?" — summed per-op durations cannot (copy-start spans
cover their whole async window, overlapping every op underneath).

    PYTHONPATH= JAX_PLATFORMS=cpu PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/xplane_timeline.py /tmp/prof_train
"""
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def union_ms(intervals):
    total = 0
    end = -1
    for b, e in sorted(intervals):
        if b > end:
            total += e - b
            end = e
        elif e > end:
            total += e - end
            end = e
    return total / 1e9


def main(profile_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{profile_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {profile_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        print(f"=== plane: {plane.name} ===")
        for line in plane.lines:
            if not line.events:
                continue
            compute, copies, all_iv = [], [], []
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "")
                iv = (ev.offset_ps, ev.offset_ps + ev.duration_ps)
                all_iv.append(iv)
                if "copy-start" in name or "copy-done" in name:
                    copies.append(iv)
                else:
                    compute.append(iv)
            span = (max(e for _, e in all_iv) - min(b for b, _ in all_iv)) / 1e9
            cm = union_ms(compute)
            um = union_ms(all_iv)
            print(f"line '{line.name}' ({len(line.events)} ev): "
                  f"span {span:.2f} ms | union(all) {um:.2f} | "
                  f"union(compute-only) {cm:.2f} | "
                  f"union(copy) {union_ms(copies):.2f}")


if __name__ == "__main__":
    main(sys.argv[1])
