"""End-to-end CLI smoke for scripts/linear_probe.py (the reference
lp_main/lp_train analog): tar shards with tags -> frozen-trunk probe
training + LPMetrics eval (~3 min on CPU)."""
import io
import json
import os
import subprocess
import sys
import tarfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_linear_probe_cli(tmp_path):
    from lass_tpu.audio.io import write_wav

    rng = np.random.RandomState(0)
    with tarfile.open(tmp_path / "train-000000.tar", "w") as tf:
        for i in range(4):
            wav = str(tmp_path / "tmp.wav")
            write_wav(wav, rng.randn(1, 24000).astype(np.float32) * 0.1,
                      48000)
            tf.add(wav, arcname=f"k{i}.wav")
            payload = json.dumps(
                {"text": [f"s {i}"],
                 "tag": ["cat" if i % 2 else "dog"]}).encode()
            info = tarfile.TarInfo(f"k{i}.json")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    json.dump({"cat": 0, "dog": 1}, open(tmp_path / "classes.json", "w"))

    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "linear_probe.py"),
         "--workspace", str(tmp_path / "ws"),
         "--train_shards", str(tmp_path / "train-000000.tar"),
         "--val_shards", str(tmp_path / "train-000000.tar"),
         "--class_index", str(tmp_path / "classes.json"),
         "--amodel", "HTSAT-tiny", "--mlp", "--batch_size", "2",
         "--clip_seconds", "0.5", "--max_steps", "2", "--eval_every", "2",
         "--num_workers", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "final lp metrics" in proc.stdout

    logs = list((tmp_path / "ws").rglob("metrics.jsonl"))
    assert logs
    rows = [json.loads(l) for l in open(logs[0])]
    assert np.isfinite(rows[0]["lp_loss"])
    assert any("map" in r for r in rows)
