"""End-to-end CLI smoke for scripts/clap_pretrain.py over tar shards
(the reference wds path, training/data.py:676-826 + training/main.py).

One real subprocess step with HTSAT-tiny on CPU (~3 min — the slow part
is the roberta text encoder build + the jitted contrastive step compile).
"""
import io
import json
import os
import subprocess
import sys
import tarfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_clap_pretrain_cli_shards(tmp_path):
    from lass_tpu.audio.io import write_wav

    rng = np.random.RandomState(0)
    for s in range(2):
        with tarfile.open(tmp_path / f"train-{s:06d}.tar", "w") as tf:
            for i in range(3):
                wav = str(tmp_path / "tmp.wav")
                write_wav(wav,
                          rng.randn(1, 24000).astype(np.float32) * 0.1,
                          48000)
                tf.add(wav, arcname=f"s{s}k{i}.wav")
                payload = json.dumps({"text": [f"sound {s} {i}"]}).encode()
                info = tarfile.TarInfo(f"s{s}k{i}.json")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    json.dump({f"train-{s:06d}.tar": 3 for s in range(2)},
              open(tmp_path / "sizes.json", "w"))

    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    # drop the conftest's 8-device virtual mesh: one device, batch 2
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "clap_pretrain.py"),
         "--workspace", str(tmp_path / "ws"),
         "--train_shards", str(tmp_path / "train-{000000..000001}.tar"),
         "--amodel", "HTSAT-tiny", "--batch_size", "2",
         "--clip_seconds", "0.5", "--max_steps", "1",
         "--num_workers", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]

    logs = list((tmp_path / "ws").rglob("metrics.jsonl"))
    assert logs, "no metrics written"
    rows = [json.loads(l) for l in open(logs[0])]
    assert rows and np.isfinite(rows[0]["contrastive_loss"])
