"""Generate the committed CPU golden for bench.py's on-hardware parity gate.

Runs the bench's exact fixed-seed forward (same init/input PRNG keys) in
float32 with Precision.HIGHEST DSP on CPU and stores a strided subset of
the output waveform plus the gate tolerance:

    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/make_bench_golden.py

Also measures the CPU bfloat16/HIGH forward against the golden — the same
numeric configuration the TPU bench runs — so the stored tolerance tracks
the expected mixed-precision deviation (x4 headroom) rather than a guess.
The role of this gate matches the reference's published eval numbers as a
regression oracle (/root/reference/README.md:94-99): without it, a Mosaic
or bf16 regression on the real chip would pass every CPU test AND the
bench timing.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16
SAMPLES = 160000
STRIDE = 29  # 16*160000/29 ~= 88k stored values (~350 KB npz)
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "bench_forward_b16.npz")


def forward_output(compute_dtype, dsp_precision):
    from lass_tpu.models.resunet import ResUNet30

    model = ResUNet30(compute_dtype=compute_dtype,
                      dsp_precision=dsp_precision)
    example = {
        "mixture": jnp.zeros((BATCH, 1, SAMPLES), jnp.float32),
        "condition": jnp.zeros((BATCH, 512), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    key = jax.random.PRNGKey(1)
    mixture = jax.random.normal(key, (BATCH, 1, SAMPLES), jnp.float32) * 0.1
    condition = jax.random.normal(key, (BATCH, 512), jnp.float32)
    out = jax.jit(lambda m, c: model.apply(
        variables, {"mixture": m, "condition": c},
        train=False)["waveform"])(mixture, condition)
    return np.asarray(out), variables


def main():
    assert jax.default_backend() == "cpu", (
        "golden must be generated on CPU: PYTHONPATH= JAX_PLATFORMS=cpu")
    print("computing float32/HIGHEST golden forward ...")
    gold, vars_f32 = forward_output(jnp.float32, jax.lax.Precision.HIGHEST)
    print("computing bfloat16/HIGH forward (bench numeric config) ...")
    approx, vars_bf16 = forward_output(jnp.bfloat16, jax.lax.Precision.HIGH)

    # params must be seed-identical regardless of compute dtype, or the
    # TPU-side comparison (which inits with bfloat16) is meaningless
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        vars_f32["params"], vars_bf16["params"])

    g = gold.reshape(-1)[::STRIDE].astype(np.float64)
    a = approx.reshape(-1)[::STRIDE].astype(np.float64)
    rel = float(np.linalg.norm(a - g) / np.linalg.norm(g))
    tol = max(4.0 * rel, 1e-3)
    print(f"cpu bf16/HIGH rel err vs golden: {rel:.3e} -> tol {tol:.3e}")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        values=gold.reshape(-1)[::STRIDE].astype(np.float32),
        stride=np.int64(STRIDE),
        tol=np.float64(tol),
        cpu_bf16_rel_err=np.float64(rel),
        shape=np.asarray(gold.shape, np.int64))
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
