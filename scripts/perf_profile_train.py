"""TPU train-step profiler: times the full jitted train step (device-side
mixing + fwd/bwd + AMSGrad) at the bench batch and dumps a jax.profiler
trace for scripts/parse_xplane.py.

Run on the default (axon) env, ONE process at a time:
    python scripts/perf_profile_train.py [--batch 16] \
        [--profile-dir /tmp/prof_train]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--profile-dir", default="/tmp/prof_train")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lass_tpu.data.mixer import SegmentMixer
    from lass_tpu.models.resunet import ResUNet30
    from lass_tpu.tasks.audiosep import AudioSepTask
    from lass_tpu.train.optim import build_optimizer

    print("backend:", jax.default_backend(), "devices:", jax.devices())

    samples = 160000
    task = AudioSepTask(
        model=ResUNet30(compute_dtype=jnp.bfloat16),
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

    for _ in range(2):  # compile + warm
        state, metrics = step_fn(state, batch_data, rng)
        print("loss:", float(metrics["train_loss"]))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step_fn(state, batch_data, rng)
    loss = float(metrics["train_loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print({"batch": args.batch, "ms": round(dt * 1e3, 2),
           "steps_per_s": round(1.0 / dt, 3), "loss": loss})

    jax.profiler.start_trace(args.profile_dir)
    for _ in range(3):
        state, metrics = step_fn(state, batch_data, rng)
    float(metrics["train_loss"])
    jax.profiler.stop_trace()
    print("trace written to", args.profile_dir)


if __name__ == "__main__":
    main()
