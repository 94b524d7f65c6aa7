"""Alternative-lever microbench for the folded 3x3 convs.

Questions answered on real v5e hardware (one JSON line each):
  1. bf16 dense folded conv (the current default) — the number to beat.
  2. int8 folded conv: does XLA lower s8 x s8 -> s32 conv onto the MXU's
     2x int8 path at these shapes, and at what speed?
  3. pure-matmul ceiling: the same FLOPs as ONE conv tap executed as a
     big dot — what does XLA's matmul emitter sustain vs its conv emitter?
  4. int8 matmul ceiling (same dot in s8).

Run on the TPU env:  python scripts/microbench_conv_alt.py
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


def timeit(fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def report(name, ms, flops):
    print(json.dumps({"op": name, "ms": round(ms, 3),
                      "tflops_per_s": round(flops / ms / 1e9, 1)}),
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, G, C), jnp.bfloat16) * 0.1
    w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
    conv_flops = 2 * B * T * G * C * C * 9

    @jax.jit
    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    try:
        report("conv3x3_bf16", timeit(conv_bf16, x, w), conv_flops)
    except Exception as e:
        print(json.dumps({"op": "conv3x3_bf16", "error": str(e)[:200]}),
              flush=True)

    xi = (x * 100).astype(jnp.int8)
    wi = (w * 100).astype(jnp.int8)

    @jax.jit
    def conv_int8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    try:
        report("conv3x3_int8", timeit(conv_int8, xi, wi), conv_flops)
    except Exception as e:
        print(json.dumps({"op": "conv3x3_int8", "error": str(e)[:200]}),
              flush=True)

    # int8 conv with bf16 output via scaling (realistic integration shape)
    @jax.jit
    def conv_int8_scaled(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)

    try:
        report("conv3x3_int8_scaled", timeit(conv_int8_scaled, xi, wi),
               conv_flops)
    except Exception as e:
        print(json.dumps({"op": "conv3x3_int8_scaled",
                          "error": str(e)[:200]}), flush=True)

    # matmul ceiling: one tap's FLOPs as a single big dot
    xm = x.reshape(B * T * G, C)
    wm = w[0, 0]
    dot_flops = 2 * B * T * G * C * C

    @jax.jit
    def dot_bf16(xm, wm):
        return jax.lax.dot(xm, wm, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    report("dot_2Mx128x128_bf16", timeit(dot_bf16, xm, wm), dot_flops)

    # 9-tap-equivalent matmul: K=1152 (dense-conv FLOPs as one dot)
    xk = jax.random.normal(key, (B * T * G // 8, 9 * C), jnp.bfloat16)
    wk = jax.random.normal(key, (9 * C, C), jnp.bfloat16)

    @jax.jit
    def dot_k1152(xk, wk):
        return jax.lax.dot(xk, wk, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    report("dot_262kx1152x128_bf16", timeit(dot_k1152, xk, wk),
           2 * xk.shape[0] * 9 * C * C)

    xmi = xm.astype(jnp.int8)
    wmi = wm.astype(jnp.int8)

    @jax.jit
    def dot_int8(xm, wm):
        return jax.lax.dot(xm, wm, preferred_element_type=jnp.int32)

    try:
        report("dot_2Mx128x128_int8", timeit(dot_int8, xmi, wmi), dot_flops)
    except Exception as e:
        print(json.dumps({"op": "dot_2Mx128x128_int8",
                          "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
