"""Serial TPU perf sweep over env-flag variants (ONE process at a time on
the tunnel). Each variant runs in a subprocess because the folded-ops
flags are latched at import.

    python scripts/perf_sweep.py                 # run the default grid
    python scripts/perf_sweep.py --variant NAME  # run one (subprocess mode)

Prints one JSON line per variant: {"variant", "ms", "clips_per_s"}.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

VARIANTS = {
    "dense": {},
    "pool_conv": {"LASS_TPU_POOL_IMPL": "conv"},
    "barrier_off": {"LASS_TPU_CONV_BARRIER": "off"},
    "barrier_post": {"LASS_TPU_CONV_BARRIER": "post_act"},
    "pool_conv+barrier_off": {"LASS_TPU_POOL_IMPL": "conv",
                              "LASS_TPU_CONV_BARRIER": "off"},
    "dsp_default": {"LASS_TPU_BENCH_DSP": "default"},
    "phase": {"LASS_TPU_CONV_IMPL": "phase"},
    "phase+dsp_default": {"LASS_TPU_CONV_IMPL": "phase",
                          "LASS_TPU_BENCH_DSP": "default"},
    "halo": {"LASS_TPU_CONV_IMPL": "halo"},
    "convt_grouped": {"LASS_TPU_CONVT_IMPL": "grouped"},
    "pool_conv+dsp_default": {"LASS_TPU_POOL_IMPL": "conv",
                              "LASS_TPU_BENCH_DSP": "default"},
    # forward chained inside one jit (output fed back as input): pure
    # device throughput with zero per-iter host dispatch — quantifies the
    # tunnel/dispatch gap in the wall-clock numbers
    "chain_loop": {"LASS_TPU_BENCH_CHAIN": "1"},
}


def measure(batch: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from lass_tpu.models.resunet import ResUNet30

    dsp = (jax.lax.Precision.DEFAULT
           if os.environ.get("LASS_TPU_BENCH_DSP") == "default"
           else jax.lax.Precision.HIGH)
    model = ResUNet30(compute_dtype=jnp.bfloat16, dsp_precision=dsp)
    samples = 160000
    example = {"mixture": jnp.zeros((batch, 1, samples), jnp.float32),
               "condition": jnp.zeros((batch, 512), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), example, train=False)

    @jax.jit
    def forward_sum(mixture, condition):
        out = model.apply(variables,
                          {"mixture": mixture, "condition": condition},
                          train=False)["waveform"]
        return jnp.sum(out)

    key = jax.random.PRNGKey(1)
    mixture = jax.random.normal(key, (batch, 1, samples), jnp.float32) * 0.1
    condition = jax.random.normal(key, (batch, 512), jnp.float32)

    if os.environ.get("LASS_TPU_BENCH_CHAIN") == "1":
        @jax.jit
        def chain(mixture, condition):
            def body(_, m):
                out = model.apply(
                    variables, {"mixture": m, "condition": condition},
                    train=False)["waveform"]
                return out.astype(m.dtype)

            return jnp.sum(jax.lax.fori_loop(0, iters, body, mixture))

        float(chain(mixture, condition))
        float(chain(mixture, condition))
        t0 = time.perf_counter()
        out = chain(mixture, condition)
        float(out)
        dt = (time.perf_counter() - t0) / iters
        return {"ms": round(dt * 1e3, 2), "clips_per_s": round(batch / dt, 1)}

    float(forward_sum(mixture, condition))
    float(forward_sum(mixture, condition))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward_sum(mixture, condition)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    return {"ms": round(dt * 1e3, 2), "clips_per_s": round(batch / dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--grid", nargs="*", default=None,
                    help="subset of variant names to run")
    args = ap.parse_args()

    if args.variant:  # child mode
        r = measure(args.batch, args.iters)
        print(json.dumps({"variant": args.variant, **r}), flush=True)
        return

    names = args.grid or list(VARIANTS)
    for name in names:
        env = dict(os.environ, **VARIANTS[name])
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--variant", name, "--batch", str(args.batch),
             "--iters", str(args.iters)],
            env=env, cwd=REPO, capture_output=True, text=True)
        line = [l for l in proc.stdout.splitlines()
                if l.startswith("{")]
        if proc.returncode != 0 or not line:
            print(json.dumps({"variant": name, "error":
                              proc.stderr[-400:]}), flush=True)
        else:
            print(line[-1], f"  (wall {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
