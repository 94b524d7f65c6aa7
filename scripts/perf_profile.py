"""TPU forward-pass profiler: times the headline forward, dumps a
jax.profiler trace, and prints the top HLO ops by self time plus the
op_profile category/MXU breakdown.

Run on the default (axon) env, ONE process at a time:
    python scripts/perf_profile.py [--batch 16] [--profile-dir /tmp/prof]

Batch every measurement you need into one invocation — each new jit shape
costs a 2-5 min remote compile over the tunnel.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_forward(batch: int, compute_dtype):
    import jax
    import jax.numpy as jnp

    from lass_tpu.models.resunet import ResUNet30

    model = ResUNet30(compute_dtype=compute_dtype)
    samples = 160000
    example = {
        "mixture": jnp.zeros((batch, 1, samples), jnp.float32),
        "condition": jnp.zeros((batch, 512), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), example, train=False)

    @jax.jit
    def forward_sum(mixture, condition):
        out = model.apply(variables,
                          {"mixture": mixture, "condition": condition},
                          train=False)["waveform"]
        return jnp.sum(out)

    key = jax.random.PRNGKey(1)
    mixture = jax.random.normal(key, (batch, 1, samples), jnp.float32) * 0.1
    condition = jax.random.normal(key, (batch, 512), jnp.float32)
    return forward_sum, mixture, condition


def time_forward(forward_sum, mixture, condition, iters: int = 10) -> float:
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward_sum(mixture, condition)
    float(out)
    return (time.perf_counter() - t0) / iters


def summarize_trace(profile_dir: str, top_n: int = 35):
    """Parse the xplane dump: top self-time ops + op_profile categories.

    Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the shipped
    tensorboard_plugin_profile protos predate protobuf 4). Parsing is
    CPU-only — run it under PYTHONPATH= JAX_PLATFORMS=cpu separately from
    the TPU capture: perf_profile.py --parse-only --profile-dir DIR.
    """
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(f"{profile_dir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        print("no xplane.pb found under", profile_dir)
        return
    xplanes = [max(xplanes)]  # latest session

    try:
        data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats", {})
        if isinstance(data, bytes):
            data = data.decode()
        table = json.loads(data)
        print("\n=== framework_op_stats (top by self time) ===")
        print(table if isinstance(table, str) else "parsed")
    except Exception as e:  # tool naming varies across versions
        print("framework_op_stats unavailable:", e)

    for tool in ("op_profile", "tensorflow_stats", "kernel_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
            if isinstance(data, bytes):
                data = data.decode()
            out = f"/tmp/{tool}.json"
            with open(out, "w") as f:
                f.write(data if isinstance(data, str) else json.dumps(data))
            print(f"{tool}: wrote {out} ({len(data)} bytes)")
        except Exception as e:
            print(f"{tool}: FAILED {type(e).__name__}: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--profile-dir", default="/tmp/prof_r2")
    ap.add_argument("--also-batch", type=int, nargs="*", default=[],
                    help="extra batch sizes to try (catch OOM)")
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--parse-only", action="store_true",
                    help="just parse an existing trace (CPU env)")
    ap.add_argument("--dump-hlo", default=None,
                    help="write the compiled optimized HLO text here")
    args = ap.parse_args()

    if args.parse_only:
        summarize_trace(args.profile_dir)
        return

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), "devices:", jax.devices())
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            print("memory_stats:", {k: v for k, v in stats.items()
                                    if "bytes" in k or "limit" in k})
    except Exception as e:
        print("memory_stats unavailable:", e)

    fwd, mix, cond = build_forward(args.batch, jnp.bfloat16)
    if args.dump_hlo:
        txt = jax.jit(fwd).lower(mix, cond).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"wrote optimized HLO ({len(txt)} bytes) to {args.dump_hlo}")
    float(fwd(mix, cond))
    float(fwd(mix, cond))
    dt = time_forward(fwd, mix, cond, args.iters)
    print(json.dumps({"batch": args.batch, "ms": round(dt * 1e3, 2),
                      "clips_per_s": round(args.batch / dt, 1)}))

    if not args.no_trace:
        with jax.profiler.trace(args.profile_dir):
            for _ in range(3):
                out = fwd(mix, cond)
            float(out)
        summarize_trace(args.profile_dir)

    for b in args.also_batch:
        try:
            fwd_b, mix_b, cond_b = build_forward(b, jnp.bfloat16)
            float(fwd_b(mix_b, cond_b))
            float(fwd_b(mix_b, cond_b))
            dt = time_forward(fwd_b, mix_b, cond_b, max(4, args.iters // 2))
            print(json.dumps({"batch": b, "ms": round(dt * 1e3, 2),
                              "clips_per_s": round(b / dt, 1)}))
        except Exception as e:
            print(json.dumps({"batch": b, "error":
                              f"{type(e).__name__}: {str(e)[:300]}"}))


if __name__ == "__main__":
    main()
