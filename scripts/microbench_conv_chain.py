"""Chained-conv microbench: true per-conv time, dispatch-amortized.

The flat microbench (microbench_conv_alt.py) is contaminated by ~5 ms of
per-dispatch axon-tunnel overhead. Here N data-dependent convs run inside
ONE jit (a python-unrolled chain), so per-conv time = total / N.

Variants, at the model's hot shape (B=16, T=1024, G=128, C=128,
kernel 3x3x128x128 — the folded L1 conv, fusion.14 in the r3 profile):
  1. bf16 conv chain                      — the current default path.
  2. int8 conv chain (q -> s8xs8 conv -> s32 -> rescale bf16 each link)
     — does the v5e 2x int8 MXU path engage through XLA?
  3. bf16 conv chain with 256-in channels (fusion.9 shape).

Run on the TPU env: python scripts/microbench_conv_chain.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

B, T, G, C = 16, 1024, 128, 128
N = 12  # chain length


def run(name, fn, x, flops_per_link):
    out = fn(x)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    out = fn(x)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    ms = dt / N * 1e3
    print(json.dumps({"op": name, "ms_per_conv": round(ms, 3),
                      "tflops_per_s": round(flops_per_link / ms / 1e9, 1)}),
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, G, C), jnp.bfloat16) * 0.1
    w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * (0.05 / C ** 0.5)
    flops = 2 * B * T * G * C * C * 9

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def chain_bf16(x):
        y = x
        for _ in range(N):
            y = conv(y, w)
            # keep magnitudes bounded without leaving the VPU
            y = jnp.clip(y, -4.0, 4.0)
        return y

    run("chain_conv_bf16", chain_bf16, x, flops)

    wi = (w * (127 / 0.2)).astype(jnp.int8)

    @jax.jit
    def chain_int8(x):
        y = x
        for _ in range(N):
            yq = jnp.clip(y * 32.0, -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                yq, wi, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = jnp.clip(acc.astype(jnp.float32) * 1e-4, -4.0, 4.0
                         ).astype(jnp.bfloat16)
        return y

    run("chain_conv_int8", chain_int8, x, flops)

    # fusion.9 shape: 256 input channels
    x2 = jax.random.normal(key, (B, T, G, 2 * C), jnp.bfloat16) * 0.1
    w2a = jax.random.normal(key, (3, 3, 2 * C, C), jnp.bfloat16) * 0.01
    w2b = jax.random.normal(key, (1, 1, C, 2 * C), jnp.bfloat16) * 0.01
    flops2 = 2 * B * T * G * (2 * C) * C * 9 + 2 * B * T * G * C * 2 * C

    @jax.jit
    def chain_256(x):
        y = x
        for _ in range(N):
            z = conv(y, w2a)
            y = jnp.clip(conv(z, w2b), -4.0, 4.0)
        return y

    run("chain_conv_256to128_bf16", chain_256, x2, flops2)

    w2ai = (w2a * 1000).astype(jnp.int8)
    w2bi = (w2b * 1000).astype(jnp.int8)

    @jax.jit
    def chain_256_int8(x):
        y = x
        for _ in range(N):
            yq = jnp.clip(y * 32.0, -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                yq, w2ai, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            zq = jnp.clip(acc, -127, 127).astype(jnp.int8)
            acc2 = jax.lax.conv_general_dilated(
                zq, w2bi, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = jnp.clip(acc2.astype(jnp.float32) * 1e-5, -4.0, 4.0
                         ).astype(jnp.bfloat16)
        return y

    run("chain_conv_256to128_int8", chain_256_int8, x2, flops2)


if __name__ == "__main__":
    main()
