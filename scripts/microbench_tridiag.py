"""Mosaic viability microbench for the tridiagonal folded-conv kernel.

The dense folded 3x3 convs run at peak MXU under XLA (~3.2 ms for the L1
conv at B=16) but execute 4x the useful FLOPs. A Pallas kernel doing ONLY
the D=0 fold-tridiagonal tap (3 time-tap matmuls of K=128, 1/3 of the
dense FLOPs) would beat it IF Mosaic's matmul pipeline sustains enough of
peak — round 2 measured a 4.6 ms floor at t_tile=16, losing to XLA. This
microbench isolates the question with a minimal kernel at several tile
sizes before any integration work.

Run on the TPU env:  python scripts/microbench_tridiag.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, G, C = 16, 1024, 128, 128


def _kernel(x_hbm, w_ref, out_ref, xs, sems, *, tt: int, t_total: int,
            fuse_act: bool):
    bi = pl.program_id(0)
    j = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_b = pl.num_programs(0)
    g = out_ref.shape[2]
    c = x_hbm.shape[-1]
    n = tt * g

    # double-buffered DMA of (tt + 2) rows: 1 top halo, tt main, 1 bottom
    def issue(b_, j_, slot, start):
        lo = jnp.maximum(j_ * tt - 1, 0)
        hi = jnp.minimum(j_ * tt + tt + 1, t_total)
        dma = pltpu.make_async_copy(
            x_hbm.at[b_, pl.ds(lo, tt + 2)],
            xs.at[slot], sems.at[slot])
        del hi
        dma.start() if start else dma.wait()

    step = bi * n_t + j
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        issue(bi, j, slot, start=True)

    nxt = step + 1
    nb, nj = nxt // n_t, jax.lax.rem(nxt, n_t)

    @pl.when(nxt < n_b * n_t)
    def _():
        issue(nb, nj, 1 - slot, start=True)

    issue(bi, j, slot, start=False)

    x = xs[slot]  # (tt + 2, G, C) bf16
    if fuse_act:
        x = jnp.maximum(x, 0.01 * x)
    flat = x.reshape((tt + 2) * g, c)
    acc = jnp.zeros((n, c), jnp.float32)
    for dt in range(3):
        acc = acc + jax.lax.dot(
            flat[dt * g:dt * g + n], w_ref[pl.ds(dt * c, c)],
            preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(tt, g, c).astype(out_ref.dtype)


def tridiag_conv(x, w3, tt, fuse_act=False):
    bsz, t, g, c = x.shape
    kern = functools.partial(_kernel, tt=tt, t_total=t, fuse_act=fuse_act)
    return pl.pallas_call(
        kern,
        grid=(bsz, t // tt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((3 * c, c), lambda bi, ti: (0, 0))],
        out_specs=pl.BlockSpec((1, tt, g, c), lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t, g, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, g, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x, w3)


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jnp.sum(out).block_until_ready()
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, G, C), jnp.bfloat16) * 0.1
    w3 = jax.random.normal(key, (3 * C, C), jnp.bfloat16) * 0.05
    wconv = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05

    @jax.jit
    def xla_dense(x):
        return jax.lax.conv_general_dilated(
            x, wconv, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    print(json.dumps({"op": "xla_dense_3x3",
                      "ms": round(timeit(xla_dense, x), 3)}), flush=True)

    for tt in (16, 32, 64):
        for act in (False, True):
            try:
                fn = jax.jit(functools.partial(tridiag_conv, tt=tt,
                                               fuse_act=act))
                ms = timeit(fn, x, w3)
                print(json.dumps({"op": "pallas_tridiag", "tt": tt,
                                  "act": act, "ms": round(ms, 3)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"op": "pallas_tridiag", "tt": tt,
                                  "act": act,
                                  "error": f"{type(e).__name__}: "
                                  f"{str(e)[:200]}"}), flush=True)


if __name__ == "__main__":
    main()
