"""int16 wire format + device prefetcher (round-5 sustained-training work).

The sustained bench's decomposition showed the serial step loop was
host->device UPLOAD-bound (dispatch 328.8 s of a 404.7 s 500-step run,
BENCH_r05 forensics): a 16x10s float32 batch is 10.24 MB/step through a
~20-40 MB/s link. Two fixes, both pinned here:
- config train.wire_dtype='int16' halves the bytes; exact for PCM-sourced
  audio (read_wav scales int16 by 1/32768, audio/io.py:142; the device
  decode multiplies by the same power of two — tasks/audiosep.py).
- train/loop.py:_DevicePrefetcher pipelines upload + text embed one batch
  ahead of the step loop on a producer thread.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lass_tpu.tasks.audiosep import _decode_wire
from lass_tpu.train.loop import _DevicePrefetcher, _encode_wire


def test_wire_roundtrip_exact_for_pcm():
    # floats that came from 16-bit PCM are n/32768 — the wire roundtrip
    # must reproduce them BIT-exactly
    ints = np.random.default_rng(0).integers(-32768, 32768, size=(4, 1, 257),
                                             dtype=np.int64)
    pcm = (ints / 32768.0).astype(np.float32)
    wire = _encode_wire(pcm, "int16")
    assert wire.dtype == np.int16 and wire.nbytes == pcm.nbytes // 2
    back = np.asarray(_decode_wire(jnp.asarray(wire)))
    np.testing.assert_array_equal(back, pcm)


def test_wire_float32_passthrough():
    x = np.random.default_rng(1).standard_normal((2, 1, 64)).astype(
        np.float32)
    assert _encode_wire(x, "float32") is x
    np.testing.assert_array_equal(np.asarray(_decode_wire(jnp.asarray(x))),
                                  x)


def test_wire_clips_out_of_range():
    x = np.array([[[-2.0, 2.0, 0.999999]]], np.float32)
    w = _encode_wire(x, "int16")
    assert w.min() == -32768 and w.max() == 32767


def test_train_step_int16_matches_float32():
    """The full jitted train step must produce identical updates whether
    the PCM batch arrives as float32 or int16 wire."""
    from lass_tpu.data.mixer import SegmentMixer
    from lass_tpu.models.resunet import ResUNet30
    from lass_tpu.tasks.audiosep import AudioSepTask
    from lass_tpu.train.optim import build_optimizer

    samples = 4096
    task = AudioSepTask(
        model=ResUNet30(),
        mixer=SegmentMixer(max_mix_num=2, lower_db=-10, higher_db=10),
        optimizer=build_optimizer("AdamW", 1e-3, "constant_warm_up",
                                  10, 100),
    )
    state0 = task.init_state(jax.random.PRNGKey(0), samples)
    ints = np.random.default_rng(2).integers(-3000, 3000, size=(4, 1, samples))
    pcm = (ints / 32768.0).astype(np.float32)
    cond = np.random.default_rng(3).standard_normal((4, 512)).astype(
        np.float32)
    rng = jax.random.PRNGKey(7)

    step = jax.jit(task.train_step)
    _, m_f32 = step(state0, {"waveform": jnp.asarray(pcm),
                             "condition": jnp.asarray(cond)}, rng)
    _, m_i16 = step(state0, {"waveform": jnp.asarray(
        _encode_wire(pcm, "int16")), "condition": jnp.asarray(cond)}, rng)
    # the decoded waveform is BIT-identical (roundtrip test above), so the
    # loss matches exactly; grad_norm picks up ~1e-7 relative float
    # reassociation because XLA fuses the decode multiply into downstream
    # ops (fma) differently than a parameter input
    assert float(m_f32["train_loss"]) == float(m_i16["train_loss"])
    np.testing.assert_allclose(float(m_f32["grad_norm"]),
                               float(m_i16["grad_norm"]), rtol=1e-5)


def test_config_rejects_bad_wire_dtype(tmp_path):
    from lass_tpu.config import load_config

    p = tmp_path / "bad.yaml"
    p.write_text("train:\n    wire_dtype: int8\n")
    with pytest.raises(ValueError, match="wire_dtype"):
        load_config(str(p))


# ---------------- _DevicePrefetcher ----------------

def test_prefetcher_preserves_order_and_indices():
    seen = []

    def prepare(i, item):
        seen.append(i)
        return item * 10 + i

    out = list(_DevicePrefetcher(range(20), prepare))
    assert out == [x * 10 + i for i, x in enumerate(range(20))]
    assert seen == list(range(20))


def test_prefetcher_propagates_prepare_error():
    def prepare(i, item):
        if i == 3:
            raise ValueError("boom at 3")
        return item

    pf = _DevicePrefetcher(range(10), prepare)
    got = [next(pf) for _ in range(3)]
    assert got == [0, 1, 2]
    with pytest.raises(RuntimeError, match="device prefetch failed"):
        while True:
            next(pf)


def test_prefetcher_close_unblocks_producer():
    """Early exit from the training loop (max_steps) must not leave the
    producer thread wedged on a full queue."""
    def prepare(i, item):
        return item

    pf = _DevicePrefetcher(iter(range(10 ** 6)), prepare, depth=2)
    assert next(pf) == 0
    pf.close()
    assert not pf._thread.is_alive()
