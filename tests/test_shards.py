"""Tar-shard pipeline (lass_tpu/data/shards.py) vs the reference
webdataset behavior (models/CLAP/training/data.py:676-826)."""
import io
import json
import os
import tarfile

import numpy as np
import pytest

from lass_tpu.audio.io import write_wav
from lass_tpu.data.shards import (
    TarShardDataset, collate, detshuffle, expand_shards, get_dataset_size,
    iter_tar_samples, sample_prop)


def _make_shard(path, keys, sr=16000, seconds=0.5, texts=None, tags=None):
    rng = np.random.RandomState(42)
    with tarfile.open(path, "w") as tf:
        for k in keys:
            wav_path = str(path) + f".{k}.wav"
            write_wav(wav_path,
                      rng.randn(1, int(sr * seconds)).astype(np.float32)
                      * 0.1, sr)
            tf.add(wav_path, arcname=f"{k}.wav")
            os.remove(wav_path)
            meta = {"text": texts[k] if texts else [f"caption {k}"]}
            if tags:
                meta["tag"] = tags.get(k, [])
            payload = json.dumps(meta).encode()
            info = tarfile.TarInfo(f"{k}.json")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))


@pytest.fixture
def shard_dir(tmp_path):
    keys0 = [f"a{i:03d}" for i in range(6)]
    keys1 = [f"b{i:03d}" for i in range(6)]
    _make_shard(tmp_path / "train-000000.tar", keys0)
    _make_shard(tmp_path / "train-000001.tar", keys1)
    json.dump({"train-000000.tar": 6, "train-000001.tar": 6},
              open(tmp_path / "sizes.json", "w"))
    return tmp_path


def test_expand_shards_brace_and_glob(tmp_path):
    got = expand_shards(["/x/{000000..000003}.tar"])
    assert got == [f"/x/{i:06d}.tar" for i in range(4)]
    (tmp_path / "s1.tar").touch()
    (tmp_path / "s2.tar").touch()
    got = expand_shards([str(tmp_path / "s*.tar")])
    assert [os.path.basename(p) for p in got] == ["s1.tar", "s2.tar"]


def test_expand_shards_multi_brace():
    got = expand_shards(["/x/{0..1}/t-{00..02}.tar"])
    assert got == [f"/x/{i}/t-{j:02d}.tar"
                   for i in range(2) for j in range(3)]


def test_sample_shuffle_fills_buffer_to_bufsize():
    """wds._shuffle parity: the steady-state shuffle buffer grows to
    `bufsize` (not `initial`), so late items can land early in the order."""
    ds = TarShardDataset.__new__(TarShardDataset)
    ds.train = True
    ds.seed = 0
    ds.epoch = 0
    ds.shuffle_buffer = 50
    ds.shuffle_initial = 10
    items = [{"i": i} for i in range(200)]
    ds._iter_raw = lambda: iter(items)
    out = list(TarShardDataset._iter_shuffled(ds))
    assert sorted(x["i"] for x in out) == list(range(200))
    # with a buffer of 50, some of the first 10 emitted items should come
    # from beyond the first `initial + 1` raw items (impossible with the
    # old initial-sized steady-state buffer)
    assert max(x["i"] for x in out[:10]) > 11


def test_iter_tar_samples_groups_by_key(shard_dir):
    samples = list(iter_tar_samples(str(shard_dir / "train-000000.tar")))
    assert len(samples) == 6
    s = samples[0]
    assert {"__key__", "__url__", "wav", "json"} <= set(s)
    assert s["wav"][:4] == b"RIFF"


def test_sizes_and_proportion(shard_dir):
    shards = expand_shards([str(shard_dir / "train-{000000..000001}.tar")])
    n, k = get_dataset_size(shards)
    assert (n, k) == (12, 2)
    n1, picked = sample_prop(shards, 0.5, seed=3)
    assert len(picked) == 1 and n1 == 6


def test_detshuffle_deterministic():
    items = list(range(20))
    assert detshuffle(items, 5, 0) == detshuffle(items, 5, 0)
    assert detshuffle(items, 5, 0) != detshuffle(items, 5, 1)


def test_epoch_batches_and_preprocess(shard_dir):
    ds = TarShardDataset(
        shards=[str(shard_dir / "train-{000000..000001}.tar")],
        batch_size=4, max_len=16000, num_workers=2, seed=1)
    assert ds.num_samples == 12
    # reference with_epoch math: ceil(ceil(12/4)/2 workers)*2 = 4
    assert ds.num_batches(world_size=1) == 4
    batches = list(ds)
    assert len(batches) == 3  # full batches only (partial=False)
    b = batches[0]
    assert b["waveform"].shape == (4, 16000)
    assert b["waveform"].dtype == np.float32
    # 0.5 s at 16 kHz repeatpadded to 1 s: first half == second half copy
    w = b["waveform"][0]
    np.testing.assert_allclose(w[:8000], w[8000:16000], atol=0)
    assert len(b["raw_text"]) == 4 and b["raw_text"][0].startswith("caption")
    assert b["audio_orig_sr"].tolist() == [16000] * 4


def test_flac_shard_roundtrip(tmp_path):
    """LAION-audio-style FLAC tars: the pipeline decodes .flac members
    via the format-sniffing loader (reference: wds.torch_audio in
    models/CLAP/training/data.py decodes FLAC shard members). FLAC is
    lossless, so the batch waveform is exactly the encoder's int16
    samples through the pipeline's standard int16 roundtrip."""
    from lass_tpu.audio.flac import encode_flac
    from lass_tpu.data.shards import _int16_roundtrip

    rng = np.random.RandomState(11)
    sr, n = 16000, 16000
    waves = {f"k{i}": (rng.randn(1, n) * 0.1).astype(np.float32)
             for i in range(4)}
    with tarfile.open(tmp_path / "fl-000000.tar", "w") as tf:
        for k, w in waves.items():
            blob = encode_flac(w, sr)
            info = tarfile.TarInfo(f"{k}.flac")
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
            payload = json.dumps({"text": [f"caption {k}"]}).encode()
            info = tarfile.TarInfo(f"{k}.json")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    ds = TarShardDataset(shards=[str(tmp_path / "fl-000000.tar")],
                         batch_size=4, max_len=n, train=False,
                         num_workers=1, audio_ext="flac")
    batches = list(ds)
    assert len(batches) == 1
    b = batches[0]
    assert b["waveform"].shape == (4, n)
    for name, wav in zip(b["audio_name"], b["waveform"]):
        key = name.split(".")[0]
        ints = np.round(waves[key][0] * 32767.0)  # encoder quantization
        want = _int16_roundtrip((ints / 32768.0).astype(np.float32))
        np.testing.assert_array_equal(wav, want)


def test_host_split_disjoint_and_covering(shard_dir):
    shards = [str(shard_dir / "train-{000000..000001}.tar")]
    seen = []
    for rank in range(2):
        ds = TarShardDataset(shards=shards, batch_size=3, max_len=8000,
                             num_workers=1, seed=0, process_index=rank,
                             process_count=2)
        for batch in ds:
            seen.extend(batch["audio_name"])
    assert len(seen) == 12 and len(set(seen)) == 12


def test_eval_keeps_partial_batches(shard_dir):
    ds = TarShardDataset(
        shards=[str(shard_dir / "train-000000.tar")], batch_size=4,
        max_len=8000, train=False, num_workers=1)
    batches = list(ds)
    assert [len(b["raw_text"]) for b in batches] == [4, 2]
    # eval order is deterministic (no shuffles)
    again = [n for b in ds for n in b["audio_name"]]
    assert [n for b in batches for n in b["audio_name"]] == again


def test_fusion_mode_and_class_labels(tmp_path):
    keys = [f"c{i}" for i in range(4)]
    tags = {k: (["dog"] if i % 2 else ["cat", "dog"])
            for i, k in enumerate(keys)}
    _make_shard(tmp_path / "f-000000.tar", keys, sr=8000, seconds=2.0,
                tags=tags)
    ds = TarShardDataset(
        shards=[str(tmp_path / "f-000000.tar")], batch_size=4,
        max_len=8000, data_truncating="fusion", num_workers=1,
        class_index_dict={"cat": 0, "dog": 1})
    (batch,) = list(ds)
    assert batch["mel_fusion"].shape[0] == 4
    assert batch["mel_fusion"].shape[1] == 4  # (B, 4, T, mel)
    assert batch["longer"].dtype == np.bool_ and batch["longer"].all()
    assert batch["waveform"].shape == (4, 8000)
    np.testing.assert_array_equal(
        batch["class_label"].sum(axis=1) > 0, [True] * 4)


def test_corrupt_member_skipped(tmp_path, caplog):
    _make_shard(tmp_path / "x-000000.tar", ["k0", "k1"])
    # append a sample whose wav payload is garbage
    with tarfile.open(tmp_path / "x-000000.tar", "a") as tf:
        info = tarfile.TarInfo("zz.wav")
        info.size = 10
        tf.addfile(info, io.BytesIO(b"notawavfil"))
        info = tarfile.TarInfo("zz.json")
        payload = json.dumps({"text": ["x"]}).encode()
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    ds = TarShardDataset(shards=[str(tmp_path / "x-000000.tar")],
                         batch_size=2, max_len=8000, train=False,
                         num_workers=1)
    (batch,) = list(ds)
    assert len(batch["raw_text"]) == 2  # corrupt sample dropped


def test_collate_mixed_types():
    batch = [{"a": np.ones(3), "s": "x", "f": 1.5, "b": True},
             {"a": np.zeros(3), "s": "y", "f": 2.5, "b": False}]
    out = collate(batch)
    assert out["a"].shape == (2, 3)
    assert out["s"] == ["x", "y"]
    assert out["f"].tolist() == [1.5, 2.5]
    assert out["b"].dtype == np.bool_
