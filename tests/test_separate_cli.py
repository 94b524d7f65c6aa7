"""separate.py CLI end-to-end on a random-weight checkpoint."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}


def test_separate_cli(tmp_path, rng):
    import jax

    from lass_tpu.audio.io import read_wav, write_wav
    from lass_tpu.config import Config
    from lass_tpu.data.mixer import SegmentMixer
    from lass_tpu.tasks.audiosep import AudioSepTask
    from lass_tpu.train.checkpoint import CheckpointManager
    from lass_tpu.train.loop import build_model
    from lass_tpu.train.optim import build_optimizer

    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(
        "task_name: AudioSep\n"
        "data:\n    sampling_rate: 16000\n    segment_seconds: 1\n"
        "model:\n    compute_dtype: float32\n"
        "train: {}\n")

    cfg = Config()
    cfg.data.segment_seconds = 1
    cfg.model.compute_dtype = "float32"
    task = AudioSepTask(build_model(cfg), SegmentMixer(2, -10, 10),
                        build_optimizer("AdamW", 1e-3, "constant_warm_up",
                                        10, 100))
    state = task.init_state(jax.random.PRNGKey(0), 16000)
    ckpt = CheckpointManager(str(tmp_path / "ckpts"), 1)
    ckpt.save(1, state)
    ckpt.wait()

    mix = tmp_path / "mix.wav"
    write_wav(str(mix), rng.randn(1, 16000).astype(np.float32) * 0.1, 16000)
    out = tmp_path / "sep.wav"

    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "separate.py"),
         "--checkpoint_path", str(tmp_path / "ckpts"),
         "--input", str(mix), "--query", "a dog barking",
         "--output", str(out), "--config_yaml", str(cfg_yaml)],
        env=ENV, capture_output=True, text=True, timeout=1200)
    assert result.returncode == 0, result.stderr[-2000:]
    audio, sr = read_wav(str(out))
    assert sr == 16000 and audio.shape == (1, 16000)

    # int8 PTQ path (--quantize): calibrate-on-input then int8 separate;
    # output must stay close to the float CLI output
    outq = tmp_path / "sep_q.wav"
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "separate.py"),
         "--checkpoint_path", str(tmp_path / "ckpts"),
         "--input", str(mix), "--query", "a dog barking",
         "--output", str(outq), "--config_yaml", str(cfg_yaml),
         "--quantize"],
        env=ENV, capture_output=True, text=True, timeout=1200)
    assert result.returncode == 0, result.stderr[-2000:]
    audio_q, _ = read_wav(str(outq))
    ref, got = audio.astype(np.float64), audio_q.astype(np.float64)
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-30)
    assert rel < 0.2, rel
