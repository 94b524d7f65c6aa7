"""Headline benchmark: 10 s 16 kHz clips separated per second on one chip.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline note (BASELINE.md): the reference publishes no inference throughput.
The only derivable A100 number is the implied training throughput — 200k
steps/day at batch 16 => ~2.3 steps/s => 36.8 clips/s trained. We use that
36.8 clips/s as the vs_baseline denominator (the north-star target is >= 10x
per chip; a measured A100 inference number would be higher than this proxy,
so re-measure when the reference stack is runnable).

Run with the default (axon/TPU) environment. Use BENCH_BATCH / BENCH_ITERS
to override.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

A100_PROXY_CLIPS_PER_SEC = 36.8


def main():
    from lass_tpu.models.resunet import ResUNet30

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    samples = 160000  # 10 s @ 16 kHz

    model = ResUNet30(compute_dtype=jnp.bfloat16)
    example = {
        "mixture": jnp.zeros((batch, 1, samples), jnp.float32),
        "condition": jnp.zeros((batch, 512), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), example, train=False)

    @jax.jit
    def forward(mixture, condition):
        return model.apply(
            variables, {"mixture": mixture, "condition": condition},
            train=False)["waveform"]

    key = jax.random.PRNGKey(1)
    mixture = jax.random.normal(key, (batch, 1, samples), jnp.float32) * 0.1
    condition = jax.random.normal(key, (batch, 512), jnp.float32)

    @jax.jit
    def forward_sum(mixture, condition):
        # scalar output: a host fetch of the sum forces full completion
        # (block_until_ready can return early over the axon tunnel)
        return jnp.sum(forward(mixture, condition))

    float(forward_sum(mixture, condition))  # compile + warm
    float(forward_sum(mixture, condition))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward_sum(mixture, condition)
    float(out)
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "sep_10s_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / A100_PROXY_CLIPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
