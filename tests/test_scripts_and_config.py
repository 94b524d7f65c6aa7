"""Config system + scripts smoke tests."""
import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from lass_tpu.config import load_config, parse_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}


def test_load_base_config():
    cfg = load_config(os.path.join(REPO, "config/audiosep_base.yaml"))
    assert cfg.data.sampling_rate == 16000
    assert cfg.data.segment_samples == 160000
    assert cfg.data.stft_win_lengths == [256, 512, 2048]
    assert cfg.train.optimizer.learning_rate == 1e-3
    assert cfg.model.use_text_ratio == 1.0
    raw = parse_yaml(os.path.join(REPO, "config/audiosep_base.yaml"))
    assert raw["train"]["batch_size_per_device"] == 128


def test_float_segment_seconds_gives_int_samples(tmp_path):
    """YAML 'segment_seconds: 10.0' (synth.write_train_config emits floats)
    must still yield an int segment_samples — jnp shapes reject floats
    (regression: the sustained-train bench crashed in init_state)."""
    p = tmp_path / "cfg.yaml"
    p.write_text("task_name: AudioSep\ndata:\n    segment_seconds: 10.0\n")
    cfg = load_config(str(p))
    assert cfg.data.segment_samples == 160000
    assert isinstance(cfg.data.segment_samples, int)
    cfg.data.segment_seconds = 1.5
    assert cfg.data.segment_samples == 24000


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("task_name: X\ndata:\n    sampling_rte: 16000\n")
    with pytest.raises(KeyError):
        load_config(str(p))


def test_create_clotho_datafiles(tmp_path):
    csv_path = tmp_path / "clotho_captions_development.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file_name", "caption_1", "caption_2", "caption_3",
                    "caption_4", "caption_5"])
        w.writerow(["a.wav", "cap one", "cap two", "", "", ""])
        w.writerow(["b.wav", "only one", "", "", "", ""])
    out = tmp_path / "datafiles"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "create_clotho_datafiles.py"),
         "--csv_dir", str(tmp_path), "--output_dir", str(out)],
        check=True, env=ENV)
    data = json.load(open(out / "clotho_development.json"))["data"]
    assert len(data) == 3
    assert data[0]["wav"].endswith("development/a.wav")


def test_process_audio(tmp_path, rng):
    from lass_tpu.audio.io import read_wav, write_wav

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    write_wav(str(src_dir / "x.wav"),
              rng.randn(2, 32000).astype(np.float32) * 0.5, 32000)
    out_dir = tmp_path / "out"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "process_audio.py"),
         "--input_dir", str(src_dir), "--output_dir", str(out_dir),
         "--jobs", "1"],
        check=True, env=ENV)
    audio, sr = read_wav(str(out_dir / "x.wav"))
    assert sr == 16000 and audio.shape[0] == 1
    peak_db = 20 * np.log10(np.abs(audio).max())
    assert abs(peak_db - (-3.0)) < 0.1
