"""One-shot train-step throughput probe (TPU, default env).

Usage: LASS_TPU_REMAT=wide python scripts/train_sweep.py [iters]
Prints one JSON line: config + steps/s. Set env knobs before launch
(folded.py reads them at import time):
  LASS_TPU_CONV_BARRIER   conv1/conv2 fusion barrier (folded.py)
  LASS_TPU_REMAT          none/wide/all block remat (models/resunet.py)
  LASS_TPU_FLAT_OPT       flat-vector optimizer moments (train/optim.py)
  LASS_TPU_DONATE_BATCH   also donate the batch buffers to the step
  BENCH_DSP               default/high DSP matmul precision (as bench.py)
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
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    samples = 160000
    dsp_name = os.environ.get("BENCH_DSP", "default").upper()
    task = AudioSepTask(
        model=ResUNet30(compute_dtype=jnp.bfloat16,
                        dsp_precision=getattr(jax.lax.Precision, dsp_name)),
        mixer=SegmentMixer(max_mix_num=2, lower_db=-10, higher_db=10),
        optimizer=build_optimizer("AdamW", 1e-3, "linear_warm_up",
                                  10000, 1000000),
    )
    state = task.init_state(jax.random.PRNGKey(0), samples)
    donate = (0, 1) if os.environ.get("LASS_TPU_DONATE_BATCH") == "1" \
        else (0,)
    step_fn = jax.jit(task.train_step, donate_argnums=donate)
    key = jax.random.PRNGKey(2)

    def make_batch():
        return {
            "waveform": jax.random.normal(
                key, (batch, 1, samples), jnp.float32) * 0.1,
            "condition": jax.random.normal(key, (batch, 512), jnp.float32),
        }

    rng = jax.random.PRNGKey(3)
    for _ in range(2):  # compile + warm
        state, metrics = step_fn(state, make_batch(), rng)
        loss = float(metrics["train_loss"])
    if donate == (0,):
        batch_data = make_batch()
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step_fn(state, batch_data, rng)
    else:
        batches = [make_batch() for _ in range(iters)]
        t0 = time.perf_counter()
        for b in batches:
            state, metrics = step_fn(state, b, rng)
    loss = float(metrics["train_loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss
    print(json.dumps({
        "barrier": os.environ.get("LASS_TPU_CONV_BARRIER", "pre_act"),
        "remat": os.environ.get("LASS_TPU_REMAT", "none"),
        "flat_opt": os.environ.get("LASS_TPU_FLAT_OPT", "1"),
        "donate_batch": os.environ.get("LASS_TPU_DONATE_BATCH", "0"),
        "dsp": dsp_name,
        "batch": batch,
        "steps_per_sec": round(iters / dt, 3),
        "ms_per_step": round(dt / iters * 1000, 2),
        "loss": loss,
    }))


if __name__ == "__main__":
    main()
