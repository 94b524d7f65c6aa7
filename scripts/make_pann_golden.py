"""Regenerate tests/golden/pann_cnn14.npz — a fixed-seed Cnn14 forward
golden so tests/test_pann.py alone catches NUMERIC regressions (its other
assertions are shape/finiteness; full reference parity lives in
tests/test_reference_parity.py which needs the reference tree).

Run on CPU: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/make_pann_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lass_tpu.dsp.mel import LogMelConfig
from lass_tpu.models.clap.pann import Cnn14, PANNConfig


def main():
    assert jax.devices()[0].platform == "cpu", "golden must be CPU float32"
    cfg = PANNConfig(mel=LogMelConfig(sample_rate=16000, n_fft=256,
                                      hop_length=160, n_mels=64))
    model = Cnn14(cfg)
    rng = np.random.RandomState(7)
    wave = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), wave[:1], train=False)
    out = model.apply(variables, wave, train=False)
    emb = np.asarray(out["embedding"], np.float32)
    clip = np.asarray(out["clipwise_output"], np.float32)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "pann_cnn14.npz")
    np.savez(path, embedding_head=emb[:, ::64], clipwise_head=clip[:, ::16])
    print("wrote", path, emb[:, ::64].shape, clip[:, ::16].shape)


if __name__ == "__main__":
    main()
