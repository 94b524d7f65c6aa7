"""TPU train-step profiler: times the jitted train step and dumps a
jax.profiler trace of a few steps for offline xplane analysis
(scripts/parse_xplane.py / scripts/xplane_groups.py under the CPU env).

Run on the default (axon) env, ONE process at a time:
    python scripts/train_profile.py [--batch 16] [--profile-dir /tmp/prof_train]
Env knobs as scripts/train_sweep.py (LASS_TPU_REMAT, BENCH_DSP, ...).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--profile-dir", default="/tmp/prof_train")
    ap.add_argument("--dump-hlo", default=None)
    args = ap.parse_args()

    from lass_tpu.data.mixer import SegmentMixer
    from lass_tpu.models.resunet import ResUNet30
    from lass_tpu.tasks.audiosep import AudioSepTask
    from lass_tpu.train.optim import build_optimizer

    samples = 160000
    dsp = getattr(jax.lax.Precision,
                  os.environ.get("BENCH_DSP", "default").upper())
    task = AudioSepTask(
        model=ResUNet30(compute_dtype=jnp.bfloat16, dsp_precision=dsp),
        mixer=SegmentMixer(max_mix_num=2, lower_db=-10, higher_db=10),
        optimizer=build_optimizer("AdamW", 1e-3, "linear_warm_up",
                                  10000, 1000000),
    )
    state = task.init_state(jax.random.PRNGKey(0), samples)
    step_fn = jax.jit(task.train_step, donate_argnums=(0,))
    key = jax.random.PRNGKey(2)
    batch_data = {
        "waveform": jax.random.normal(
            key, (args.batch, 1, samples), jnp.float32) * 0.1,
        "condition": jax.random.normal(key, (args.batch, 512), jnp.float32),
    }
    rng = jax.random.PRNGKey(3)

    if args.dump_hlo:
        txt = step_fn.lower(state, batch_data, rng).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"wrote optimized HLO ({len(txt)} bytes) to {args.dump_hlo}")

    for _ in range(2):
        state, metrics = step_fn(state, batch_data, rng)
        loss = float(metrics["train_loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step_fn(state, batch_data, rng)
    loss = float(metrics["train_loss"])
    dt = (time.perf_counter() - t0) / args.iters
    assert np.isfinite(loss), loss
    print(json.dumps({"batch": args.batch,
                      "ms_per_step": round(dt * 1e3, 2),
                      "steps_per_sec": round(1 / dt, 3)}))

    with jax.profiler.trace(args.profile_dir):
        for _ in range(3):
            state, metrics = step_fn(state, batch_data, rng)
        float(metrics["train_loss"])
    print("trace written to", args.profile_dir)


if __name__ == "__main__":
    main()
