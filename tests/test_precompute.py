"""Precompute pipeline + precomputed dataset + variant tasks, end to end on
tiny data (BASELINE configs 4/5 slices)."""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.audio.io import write_wav
from lass_tpu.data.datafiles import AudioTextDataset
from lass_tpu.data.precompute import (
    compute_stfts, generate_recipes, load_recipes, save_recipes)
from lass_tpu.data.precomputed import PrecomputedSTFTDataset

WINS = (256, 512, 2048)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("corpus")
    entries = []
    for i in range(8):
        p = str(root / f"w{i}.wav")
        write_wav(p, rng.randn(1, 17000).astype(np.float32) * 0.1, 16000)
        entries.append({"wav": p, "caption": f"clip number {i}"})
    datafile = root / "data.json"
    datafile.write_text(json.dumps({"data": entries}))
    dataset = AudioTextDataset([str(datafile)], sampling_rate=16000,
                               max_clip_len=1)
    return root, dataset


@pytest.fixture(scope="module")
def precomputed(corpus):
    root, dataset = corpus
    recipes = generate_recipes(dataset, batch_size=4, max_mix_num=2,
                               lower_db=-10, higher_db=10, seed=7)
    rpath = str(root / "recipes.json")
    save_recipes(recipes, rpath)
    out_dir = str(root / "stfts")
    n = compute_stfts(dataset, load_recipes(rpath), out_dir,
                      win_lengths=WINS, hop_length=160, batch_size=4)
    return out_dir, recipes, n


def test_recipes_structure(precomputed, corpus):
    _, recipes, _ = precomputed
    _, dataset = corpus
    assert len(recipes["recipes"]) == 8
    for path, r in recipes["recipes"].items():
        assert len(r["partners"]) == 1  # max_mix_num=2
        assert -10 <= r["partners"][0]["gain_db"] <= 10
        assert r["partners"][0]["wav"] != path or True


def test_precomputed_files_and_dataset(precomputed):
    out_dir, _, n_batches = precomputed
    assert n_batches == 2
    ds = PrecomputedSTFTDataset(out_dir)
    assert len(ds) == 8
    assert ds.win_lengths() == sorted(WINS)

    item = ds[5]
    assert item["text"].startswith("clip number")
    mag, cos, sin = item["stfts"]["mixture"][512]
    # 1 s at hop 160 -> 101 frames, 257 bins, 1 channel
    assert mag.shape == (101, 257, 1)
    assert np.isfinite(mag).all()
    # cos/sin unit circle where magnitude is nonzero
    cs = cos**2 + sin**2
    assert np.abs(cs[mag[..., 0] > 1e-3] - 1).max() < 1e-3
    assert item["target_waveform"].shape == (1, 16000)
    assert isinstance(item["mixture_component_texts"], list)
    with pytest.raises(IndexError):
        ds[8]


def test_stft_consistency_with_dsp(precomputed):
    """Stored segment STFT must equal a fresh STFT of the stored target."""
    out_dir, _, _ = precomputed
    ds = PrecomputedSTFTDataset(out_dir)
    batch = ds.batch_at(0)
    from lass_tpu.dsp.stft import STFTConfig, wav_to_spectrogram_phase

    target = jnp.asarray(batch["target_waveform"])
    mag, cos, sin = wav_to_spectrogram_phase(
        target, STFTConfig(n_fft=512, hop_length=160))
    np.testing.assert_allclose(np.asarray(mag),
                               batch["stfts"]["segment"][512][0], atol=1e-4)


@pytest.fixture(scope="module")
def small_multistft_state(precomputed):
    from lass_tpu.models.resunet_multistft import MultiSTFTResUNet30
    from lass_tpu.tasks.audiosep_variants import MultiSTFTAudioSepTask
    from lass_tpu.train.optim import build_optimizer

    out_dir, _, _ = precomputed
    ds = PrecomputedSTFTDataset(out_dir)
    batch = ds.batch_at(0)

    def to_jnp(b):
        # jitted steps take only the array fields (text stays host-side)
        return {
            "stfts": jax.tree_util.tree_map(jnp.asarray, b["stfts"]),
            "target_waveform": jnp.asarray(b["target_waveform"]),
        }

    task = MultiSTFTAudioSepTask(
        MultiSTFTResUNet30(win_lengths=WINS),
        build_optimizer("AdamW", 1e-3, "constant_warm_up", 10000, 1000000))
    state = task.init_state(jax.random.PRNGKey(0), to_jnp(batch))
    return task, state, to_jnp(batch)


def test_multistft_task_train_step(small_multistft_state):
    task, state, batch = small_multistft_state
    cond = jnp.zeros((batch["target_waveform"].shape[0], 512))
    new_state, metrics = jax.jit(task.train_step)(state, batch, cond)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["train_loss"]))
    val = task.val_step(new_state, batch, cond)
    assert np.isfinite(float(val))


def test_train_multistft_cli(precomputed, corpus, tmp_path):
    """scripts/train_multistft.py end-to-end: 1 step over the tiny
    precomputed set."""
    import os
    import subprocess
    import sys

    out_dir, _, _ = precomputed
    root, _ = corpus
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu"}
    config = root / "config.yaml" if (root / "config.yaml").exists() else None
    if config is None:
        config = tmp_path / "cfg.yaml"
        config.write_text(
            "task_name: AudioSep\n"
            "data:\n    sampling_rate: 16000\n    segment_seconds: 1\n"
            "model:\n    condition_size: 512\n    compute_dtype: float32\n"
            "train:\n    save_step_frequency: 100000\n")
    result = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "train_multistft.py"),
         "--workspace", str(tmp_path / "ws"),
         "--config_yaml", str(config),
         "--precomputed_dir", out_dir,
         "--max_steps", "1"],
        env=env, capture_output=True, text=True, timeout=1200)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "finished at step 1" in result.stdout


def test_negquery_task(precomputed):
    from lass_tpu.models.resunet_multistft import MultiSTFTResUNet30
    from lass_tpu.tasks.audiosep_variants import (
        NegQueryAudioSepTask, negative_captions)
    from lass_tpu.train.optim import build_optimizer

    out_dir, _, _ = precomputed
    ds = PrecomputedSTFTDataset(out_dir)
    raw = ds.batch_at(0)
    # restrict batch to the 512 window (desired_win_len, reference :90-94)
    batch = {
        "stfts": {"mixture": {512: tuple(jnp.asarray(a) for a in
                                         raw["stfts"]["mixture"][512])},
                  "segment": {512: tuple(jnp.asarray(a) for a in
                                         raw["stfts"]["segment"][512])}},
        "target_waveform": jnp.asarray(raw["target_waveform"]),
    }
    negs = negative_captions(raw["text"], raw["mixture_component_texts"])
    assert len(negs) == len(raw["text"])
    assert any(n for n in negs)  # partners' captions present

    task = NegQueryAudioSepTask(
        MultiSTFTResUNet30(win_lengths=(512,)),
        build_optimizer("AdamW", 1e-3, "constant_warm_up", 10000, 1000000))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    assert "neg_query_fusion" in state.params

    b = batch["target_waveform"].shape[0]
    pos = jnp.ones((b, 512)) / jnp.sqrt(512.0)
    neg = jnp.zeros((b, 512))
    new_state, metrics = jax.jit(task.train_step)(state, batch, (pos, neg))
    assert np.isfinite(float(metrics["train_loss"]))
    # the fusion layer must receive gradient
    g_before = np.asarray(state.params["neg_query_fusion"]["fusion"]["kernel"])
    g_after = np.asarray(
        new_state.params["neg_query_fusion"]["fusion"]["kernel"])
    assert not np.allclose(g_before, g_after)
