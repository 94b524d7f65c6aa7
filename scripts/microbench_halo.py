"""Halo-conv microbench: can the folded 3x3 conv's 4x FLOPs blow-up be
cut to 2x with an im2col-halo formulation XLA still runs near peak?

Background: the fold-4 dense kernel executes K = 3*3*sC = 1152 per output
element (75% structural zeros). Gathering each group's 6 relevant freq
positions (4 in-group + 1 halo each side) into a 192-lane tensor needs a
kernel of only (3 time, 1 G, 192, 128): K = 576 — exactly 2x useful work,
full MXU lanes. The open question is what the lane-slice + G-shift +
concat that builds the halo tensor costs (fused into conv input, or
materialized at ~0.9 ms per 700 MB?).

Variants (chained in one jit, per-conv time):
  v0 dense folded (3,3,128,128)          — the number to beat (K=1152)
  v1 halo concat + (3,1,192,128)         — K=576
  v2 halo two-conv main+side with add    — K=576 split, no concat
  g0 dense folded 1x1 (1,1,128,128)      — K=128 executed, 32 useful
  g1 grouped 1x1 feature_group_count=4   — K=32, no blow-up

Run on the TPU env: python scripts/microbench_halo.py
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
import numpy as np

B, T, G, S, C = 16, 1024, 128, 4, 32
SC = S * C
N = 10


def run(name, fn, x, flops_per_link):
    out = fn(x)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = fn(x)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    ms = dt / N * 1e3
    print(json.dumps({"op": name, "ms_per_conv": round(ms, 3),
                      "tflops_per_s": round(flops_per_link / ms / 1e9, 1)}),
          flush=True)


def conv(x, w, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def shift_g(x, direction):
    g = x.shape[2]
    if direction == +1:
        return jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :g]
    return jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, G, SC), jnp.bfloat16) * 0.1
    scale = 0.3 / SC ** 0.5

    wd = jax.random.normal(key, (3, 3, SC, SC), jnp.bfloat16) * scale
    flops_dense = 2 * B * T * G * SC * SC * 9

    @jax.jit
    def chain_dense(x):
        y = x
        for _ in range(N):
            y = conv(y, wd)
        return y

    run("v0_dense_3x3_K1152", chain_dense, x, flops_dense)

    # v1: halo concat + (3, 1, 192, 128)
    wh = jax.random.normal(key, (3, 1, (S + 2) * C, SC), jnp.bfloat16) * scale
    flops_halo = 2 * B * T * G * (S + 2) * C * SC * 3

    @jax.jit
    def chain_halo(x):
        y = x
        for _ in range(N):
            tail = shift_g(y[..., (S - 1) * C:], +1)
            head = shift_g(y[..., :C], -1)
            yh = jnp.concatenate([tail, y, head], axis=-1)
            y = conv(yh, wh, pad=((1, 1), (0, 0)))
        return y

    run("v1_halo_concat_K576", chain_halo, x, flops_halo)

    # v2: main (3,1,128,128) + side (3,1,64,128) convs, summed
    wm = jax.random.normal(key, (3, 1, SC, SC), jnp.bfloat16) * scale
    ws = jax.random.normal(key, (3, 1, 2 * C, SC), jnp.bfloat16) * scale
    flops_split = 2 * B * T * G * SC * (SC + 2 * C) * 3

    @jax.jit
    def chain_split(x):
        y = x
        for _ in range(N):
            side = jnp.concatenate(
                [shift_g(y[..., (S - 1) * C:], +1),
                 shift_g(y[..., :C], -1)], axis=-1)
            y = (conv(y, wm, pad=((1, 1), (0, 0)))
                 + conv(side, ws, pad=((1, 1), (0, 0))))
        return y

    run("v2_split_K576", chain_split, x, flops_split)

    # 1x1: dense folded vs grouped
    w1 = jax.random.normal(key, (1, 1, SC, SC), jnp.bfloat16) * scale
    flops_1x1_dense = 2 * B * T * G * SC * SC

    @jax.jit
    def chain_1x1_dense(x):
        y = x
        for _ in range(N):
            y = conv(y, w1)
        return y

    run("g0_dense_1x1_K512", chain_1x1_dense, x, flops_1x1_dense)

    wg = jax.random.normal(key, (1, 1, C, SC), jnp.bfloat16) * (0.3 / C ** .5)
    flops_1x1_grp = 2 * B * T * G * C * SC

    @jax.jit
    def chain_1x1_grouped(x):
        y = x
        for _ in range(N):
            y = jax.lax.conv_general_dilated(
                y, wg, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=S)
        return y

    run("g1_grouped_1x1_K128", chain_1x1_grouped, x, flops_1x1_grp)


if __name__ == "__main__":
    main()
