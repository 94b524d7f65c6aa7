"""Direct XSpace (xplane.pb) parser: per-HLO-op self-time table.

tensorboard_plugin_profile's converter is version-broken against the
installed TF pywrap, so read the proto directly. Run on CPU env:

    PYTHONPATH= JAX_PLATFORMS=cpu PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/parse_xplane.py /tmp/prof_r2 [top_n]
"""
import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main(profile_dir: str, top_n: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{profile_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {profile_dir}")
    path = paths[-1]
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    print("planes:", [p.name for p in space.planes])
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        # per-line (core/step) event durations keyed by metadata name
        totals = collections.Counter()
        counts = collections.Counter()
        span_begin, span_end = None, None
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps
                counts[name] += 1
                b = ev.offset_ps
                e = ev.offset_ps + ev.duration_ps
                span_begin = b if span_begin is None else min(span_begin, b)
                span_end = e if span_end is None else max(span_end, e)
        if not totals:
            continue
        wall = (span_end - span_begin) / 1e9
        print(f"\n=== plane: {plane.name} (lines={len(plane.lines)}, "
              f"span={wall:.3f} ms) ===")
        grand = sum(totals.values())
        print(f"sum of event time: {grand/1e9:.3f} ms")
        for name, ps in totals.most_common(top_n):
            print(f"{ps/1e9:9.3f} ms  {ps/grand*100:5.1f}%  x{counts[name]:<4d} "
                  f"{name[:140]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
