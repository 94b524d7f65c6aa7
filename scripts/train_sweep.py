"""One-shot train-step throughput probe (TPU, default env).

Usage: LASS_TPU_CONV_BARRIER=none python scripts/train_sweep.py [iters]
Prints one JSON line: config + steps/s. Set env knobs before launch
(folded.py reads them at import time).
"""
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
    from lass_tpu.data.mixer import SegmentMixer
    from lass_tpu.models.resunet import ResUNet30
    from lass_tpu.tasks.audiosep import AudioSepTask
    from lass_tpu.train.optim import build_optimizer

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    batch, samples = 16, 160000
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
            key, (batch, 1, samples), jnp.float32) * 0.1,
        "condition": jax.random.normal(key, (batch, 512), jnp.float32),
    }
    rng = jax.random.PRNGKey(3)
    for _ in range(2):  # compile + warm
        state, metrics = step_fn(state, batch_data, rng)
        loss = float(metrics["train_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch_data, rng)
    loss = float(metrics["train_loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss
    print(json.dumps({
        "barrier": os.environ.get("LASS_TPU_CONV_BARRIER", "pre_act"),
        "flat_opt": os.environ.get("LASS_TPU_FLAT_OPT", "1"),
        "steps_per_sec": round(iters / dt, 3),
        "ms_per_step": round(dt / iters * 1000, 2),
        "loss": loss,
    }))


if __name__ == "__main__":
    main()
