"""Copy-stall forensics on a TPU xplane trace.

The device 'XLA Ops' line tiles the core timeline (sum of durations ==
span), so copy-start/copy-done durations there are REAL core-time
occupancy (stall while waiting on the DMA), not async spans. This tool
reports, per step: copy-op count + occupancy vs compute occupancy, the
top copy events by core time with byte sizes parsed from their shapes,
and the total bytes moved — separating "DMA is saturated" (bytes/step /
~800 GB/s ~ stall time) from "DMA is latency/serialization-bound"
(thousands of small descriptors).

    PYTHONPATH= JAX_PLATFORMS=cpu PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/xplane_copies.py /tmp/prof_train [steps]
"""
import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}
_SHAPE_RE = re.compile(r"(pred|bf16|f16|f32|f64|s8|u8|s16|u16|s32|u32|s64|"
                       r"u64)\[([0-9,]*)\]")


def first_shape_bytes(name: str) -> int:
    """Bytes of the first array shape in the op text (the op's output)."""
    m = _SHAPE_RE.search(name)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def main(profile_dir: str, steps: int = 3):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{profile_dir}/**/*.xplane.pb", recursive=True))
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            per_op = collections.Counter()
            counts = collections.Counter()
            cat_ms = collections.Counter()
            cat_n = collections.Counter()
            cat_bytes = collections.Counter()
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "")
                if name.startswith("%copy-start") or \
                        name.startswith("%copy-done"):
                    cat = "copy(async)"
                elif name.startswith("%copy"):
                    cat = "copy(sync)"
                elif "dynamic-update-slice" in name.split(" = ")[0]:
                    cat = "dus"
                else:
                    cat = "compute"
                ms = ev.duration_ps / 1e9
                cat_ms[cat] += ms
                cat_n[cat] += 1
                cat_bytes[cat] += first_shape_bytes(name)
                if cat != "compute":
                    per_op[name] += ms
                    counts[name] += 1
            print(f"\n=== line '{line.name}' (per step = /{steps}) ===")
            for cat in sorted(cat_ms):
                print(f"  {cat:12s} {cat_ms[cat]/steps:8.2f} ms/step  "
                      f"x{cat_n[cat]/steps:6.0f}/step  "
                      f"{cat_bytes[cat]/steps/1e6:8.1f} MB/step")
            print("  top copy ops by core time:")
            for name, ms in per_op.most_common(25):
                print(f"   {ms/steps:7.3f} ms/step x{counts[name]/steps:3.0f} "
                      f"{first_shape_bytes(name)/1e3:10.1f} kB  {name[:120]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3)
