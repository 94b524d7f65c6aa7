"""Utility parity tests (reference utils.py odds and ends)."""
import os
import pickle

import numpy as np

from lass_tpu.evaluation.metrics import (
    calculate_sdr, calculate_segmentwise_sdr, get_mean_sdr_from_dict,
    remove_silence, repeat_to_length)
from lass_tpu.utils.misc import (
    db_to_magnitude, float32_to_int16, ids_to_hots, int16_to_float32,
    magnitude_to_db)
from lass_tpu.utils.statistics import StatisticsContainer


def test_segmentwise_sdr(rng):
    ref = rng.randn(1, 1600).astype(np.float32)
    est = ref + rng.randn(1, 1600).astype(np.float32) * 0.01
    sdr, sdrs = calculate_segmentwise_sdr(ref, est, 160,
                                          return_sdr_list=True)
    assert len(sdrs) == 9  # pointer+hop < 1600
    assert abs(sdr - np.nanmedian(sdrs)) < 1e-9


def test_mean_sdr_from_dict():
    assert get_mean_sdr_from_dict({"a": 1.0, "b": 3.0,
                                   "c": float("nan")}) == 2.0


def test_remove_silence(rng):
    sr = 1000
    loud = rng.randn(200).astype(np.float32)
    quiet = np.zeros(300, np.float32)
    audio = np.concatenate([quiet, loud, quiet])
    out = remove_silence(audio, sr)
    assert len(out) <= 300 and len(out) >= 100


def test_repeat_to_length(rng):
    a = rng.randn(100).astype(np.float32)
    out = repeat_to_length(a, 250)
    assert out.shape == (250,)
    np.testing.assert_array_equal(out[100:200], a)


def test_misc_converters():
    x = np.array([0.0, 0.5, -1.0], np.float32)
    i = float32_to_int16(x)
    assert i.dtype == np.int16
    back = int16_to_float32(i)
    np.testing.assert_allclose(back, x, atol=1e-4)
    hots = ids_to_hots([1, 3], 5)
    np.testing.assert_array_equal(hots, [0, 1, 0, 1, 0])
    assert abs(db_to_magnitude(magnitude_to_db(0.25)) - 0.25) < 1e-6


def test_statistics_container(tmp_path):
    path = str(tmp_path / "stats.pkl")
    sc = StatisticsContainer(path)
    sc.append(100, {"sdr": 5.0}, "test")
    sc.append(200, {"sdr": 6.0}, "test")
    with open(path, "rb") as f:
        loaded = pickle.load(f)
    assert [s["steps"] for s in loaded["test"]] == [100, 200]

    sc2 = StatisticsContainer(path)
    sc2.load(resume_steps=100)
    assert len(sc2.statistics_dict["test"]) == 1
