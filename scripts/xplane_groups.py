"""Grouped XSpace analysis: per-line totals + op-category rollup.

Complements scripts/parse_xplane.py (per-op table) with the view needed
for backward-pass work: which fraction of device time is conv fusions vs
elementwise loop fusions vs copies vs RNG etc., per trace line (the 'XLA
Ops' line is the real op timeline; module/step lines are wrappers).

    PYTHONPATH= JAX_PLATFORMS=cpu PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/xplane_groups.py /tmp/prof_train [top_n]
"""
import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def categorize(name: str) -> str:
    if name.startswith("%"):
        body = name
    else:
        return "other:" + name.split("(")[0][:40]
    if "convolution" in body:
        return "convolution (bare)"
    if "copy-start" in body or "copy-done" in body:
        return "async copy"
    if "all-reduce" in body or "all-gather" in body:
        return "collective"
    if "fusion" in body:
        # classify fusion by payload hints in the printed operands
        if "conv" in body.split("=")[0] or "convolution" in body:
            return "conv fusion"
        return "fusion (other)"
    if "=" in body and "dot" in body.split("=")[1][:60]:
        return "dot"
    return "op:" + re.sub(r"[%.].*", "", body)[:30]


def main(profile_dir: str, top_n: int = 30):
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
        for line in plane.lines:
            totals = collections.Counter()
            counts = collections.Counter()
            cat_totals = collections.Counter()
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps
                counts[name] += 1
                cat_totals[categorize(name)] += ev.duration_ps
            if not totals:
                continue
            grand = sum(totals.values())
            print(f"\n==== line: {line.name!r} (events="
                  f"{sum(counts.values())}, sum={grand/1e9:.3f} ms) ====")
            if line.name in ("XLA Ops", ""):
                print("-- categories --")
                for cat, ps in cat_totals.most_common(15):
                    print(f"{ps/1e9:9.3f} ms {ps/grand*100:5.1f}%  {cat}")
                print("-- top ops --")
                for name, ps in totals.most_common(top_n):
                    print(f"{ps/1e9:9.3f} ms {ps/grand*100:5.1f}% "
                          f"x{counts[name]:<3d} {name[:150]}")
            else:
                for name, ps in totals.most_common(5):
                    print(f"{ps/1e9:9.3f} ms x{counts[name]} {name[:100]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
