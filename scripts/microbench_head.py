"""TPU microbenchmarks for the after_conv head layout and the conv ceiling.

One process, all shapes in one run (each new jit shape = remote compile).
    python scripts/microbench_head.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    s = float(jnp.sum(jax.tree.leaves(out)[0]))  # force completion
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    b, t, g, c, m = 16, 1024, 128, 128, 12
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (b, t, g, c), jnp.bfloat16)
    w = jax.random.normal(key, (c, m), jnp.bfloat16)

    @jax.jit
    def head_conv(h, w):
        # current: folded 1x1 conv -> (b, t, g, m) 12-lane-padded output
        return jax.lax.conv_general_dilated(
            h, w.reshape(1, 1, c, m), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def head_dot_t(h, w):
        # transposed-output dot -> (m, b, t, g): minor dim g = 128, no pad
        return jax.lax.dot_general(
            w, h, dimension_numbers=(((0,), (3,)), ((), ())),
            preferred_element_type=jnp.float32)

    @jax.jit
    def conv3x3(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    k128 = jax.random.normal(key, (3, 3, 128, 128), jnp.bfloat16)
    k256 = jax.random.normal(key, (3, 3, 256, 128), jnp.bfloat16)
    x256 = jax.random.normal(key, (b, t, g, 256), jnp.bfloat16)

    results = {}
    results["head_conv_ms"] = timeit(head_conv, h, w)
    results["head_dot_t_ms"] = timeit(head_dot_t, h, w)
    results["conv3x3_128_ms"] = timeit(conv3x3, h, k128)
    results["conv3x3_256in_ms"] = timeit(conv3x3, x256, k256)
    fl128 = 2 * b * t * g * 9 * 128 * 128 / 1e12
    fl256 = 2 * b * t * g * 9 * 256 * 128 / 1e12
    results["conv3x3_128_mxu_pct"] = round(
        100 * fl128 / 394 / (results["conv3x3_128_ms"] / 1e3), 1)
    results["conv3x3_256in_mxu_pct"] = round(
        100 * fl256 / 394 / (results["conv3x3_256in_ms"] / 1e3), 1)

    # wider batch as rows: does collapsing (b,t) help the 3x3 conv?
    x_flat = h.reshape(1, b * t, g, c)  # invalid halo at seams, perf probe only
    results["conv3x3_flatB_ms"] = timeit(conv3x3, x_flat, k128)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
