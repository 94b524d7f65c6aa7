"""DCASE evaluator tests: mixture construction, metric math, batched harness
(BASELINE config 3 slice with a stub separator)."""
import csv
import os

import numpy as np
import pytest

from lass_tpu.audio.io import write_wav
from lass_tpu.evaluation.dcase import DCASEEvaluator, make_snr_mixture
from lass_tpu.evaluation.metrics import calculate_sdr, calculate_sisdr


def test_make_snr_mixture_snr_and_declip(rng):
    src = rng.randn(16000).astype(np.float32) * 0.1
    noi = rng.randn(16000).astype(np.float32) * 0.3
    s, m = make_snr_mixture(src, noi, snr_db=5)
    n = m - s
    snr = 10 * np.log10(np.mean(s**2) / np.mean(n**2))
    np.testing.assert_allclose(snr, 5.0, atol=0.01)

    loud_src = rng.randn(8000).astype(np.float32) * 2.0
    s2, m2 = make_snr_mixture(loud_src, noi[:8000], snr_db=0)
    assert np.abs(m2).max() <= 0.9 + 1e-6


def test_metrics_match_reference_formulas(rng):
    ref = rng.randn(1000).astype(np.float32)
    est = ref + rng.randn(1000).astype(np.float32) * 0.1
    sdr = calculate_sdr(ref, est)
    expected = 10 * np.log10(np.mean(ref**2) / np.mean((est - ref)**2))
    np.testing.assert_allclose(sdr, expected, rtol=1e-6)
    # scale invariance of SI-SDR
    np.testing.assert_allclose(calculate_sisdr(ref, est * 3.0),
                               calculate_sisdr(ref, est), atol=1e-3)


class IdentityModel:
    """Stub: separation == mixture => SDRi must be exactly 0."""

    class _QE:
        def get_query_embed(self, modality, text=None, **kw):
            return np.zeros((len(text), 512), np.float32)

    query_encoder = _QE()

    def separate(self, mixtures, conditions):
        return mixtures


@pytest.fixture
def eval_set(tmp_path, rng):
    names = []
    for i in range(3):
        for kind in ["src", "noise"]:
            name = f"{kind}{i}"
            write_wav(str(tmp_path / f"{name}.wav"),
                      rng.randn(1, 16000).astype(np.float32) * 0.1, 16000)
        names.append((f"src{i}", f"noise{i}"))
    csv_path = tmp_path / "eval.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["source", "noise", "snr", "caption"])
        for i, (s, n) in enumerate(names):
            w.writerow([s, n, str(i * 5 - 5), f"caption {i}"])
    return str(csv_path), str(tmp_path)


def test_evaluator_identity_model(eval_set):
    csv_path, audio_dir = eval_set
    evaluator = DCASEEvaluator(16000, csv_path, audio_dir, batch_size=2)
    sisdr, sdri, sdr = evaluator(IdentityModel())
    np.testing.assert_allclose(sdri, 0.0, atol=1e-5)
    assert np.isfinite(sisdr) and np.isfinite(sdr)


def test_load_ss_model_roundtrip(tmp_path, rng):
    """load_ss_model (reference utils.py:356-400 parity): save an orbax
    training checkpoint, reload for inference, separate a clip."""
    import jax
    import jax.numpy as jnp

    from lass_tpu.config import Config
    from lass_tpu.convert.checkpoint_io import load_ss_model
    from lass_tpu.data.mixer import SegmentMixer
    from lass_tpu.tasks.audiosep import AudioSepTask
    from lass_tpu.train.checkpoint import CheckpointManager
    from lass_tpu.train.loop import build_model
    from lass_tpu.train.optim import build_optimizer

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

    model = load_ss_model(cfg, str(tmp_path / "ckpts"),
                          query_encoder=IdentityModel._QE())
    out = model.separate(
        rng.randn(1, 1, 16000).astype(np.float32) * 0.1,
        np.zeros((1, 512), np.float32))
    assert out.shape == (1, 1, 16000)
    assert np.isfinite(out).all()


def test_evaluator_oracle_model(eval_set, rng):
    """A 'perfect' separator stub that we rig to return the clean source:
    SDR must be very large."""
    csv_path, audio_dir = eval_set
    evaluator = DCASEEvaluator(16000, csv_path, audio_dir, batch_size=3)

    class Oracle(IdentityModel):
        def separate(self, mixtures, conditions):
            from lass_tpu.audio.io import read_wav
            rows = evaluator.eval_list
            out = np.zeros_like(mixtures)
            for i, (s_name, n_name, snr, _cap) in enumerate(rows):
                src, _ = read_wav(os.path.join(audio_dir, f"{s_name}.wav"))
                noi, _ = read_wav(os.path.join(audio_dir, f"{n_name}.wav"))
                s, _m = make_snr_mixture(src[0], noi[0], int(snr))
                out[i, 0, :len(s)] = s
            return out

    sisdr, sdri, sdr = evaluator(Oracle())
    assert sdr > 80 and sdri > 80


def test_evaluator_single_static_shape(tmp_path, rng):
    """Heterogeneous clip lengths + a ragged final batch must all hit ONE
    (batch_size, 1, fixed_len) forward shape (axon recompiles are 2-5 min
    per new shape)."""
    names = []
    for i, n_samples in enumerate([12800, 16000, 9600]):
        for kind in ["src", "noise"]:
            write_wav(str(tmp_path / f"{kind}{i}.wav"),
                      rng.randn(1, n_samples).astype(np.float32) * 0.1,
                      16000)
        names.append((f"src{i}", f"noise{i}"))
    csv_path = tmp_path / "eval.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["source", "noise", "snr", "caption"])
        for i, (s, n) in enumerate(names):
            w.writerow([s, n, "0", f"caption {i}"])

    class ShapeRecordingModel(IdentityModel):
        shapes = []

        def separate(self, mixtures, conditions):
            self.shapes.append((mixtures.shape, conditions.shape))
            return mixtures

    model = ShapeRecordingModel()
    evaluator = DCASEEvaluator(16000, str(csv_path), str(tmp_path),
                               batch_size=2, pad_seconds=1.0)
    sisdr, sdri, sdr = evaluator(model)
    np.testing.assert_allclose(sdri, 0.0, atol=1e-5)
    assert len(model.shapes) == 2  # 3 rows, batch 2 -> full + ragged batch
    assert len(set(model.shapes)) == 1, model.shapes
    assert model.shapes[0][0] == (2, 1, 16000)


def test_evaluator_quantized_close_to_float(eval_set, rng):
    """--quantize analog: SeparationInference with quantize=True, with the
    production calibration protocol (multi-batch amax accumulation +
    offline weight pack), must score within 0.1 dB of the float evaluator
    on every reported metric (random-weight model, tiny eval set). This
    is the quality gate for the int8 headline path — 0.1 dB is well
    inside the ±0.05+0.05 dB noise band of the reference parity bar."""
    import jax
    import jax.numpy as jnp

    from lass_tpu.evaluation.dcase import SeparationInference
    from lass_tpu.models.resunet import ResUNet30

    csv_path, audio_dir = eval_set

    ex = {"mixture": jnp.zeros((3, 1, 16000), jnp.float32),
          "condition": jnp.zeros((3, 512), jnp.float32)}
    variables = ResUNet30(freq_fold=4).init(
        jax.random.PRNGKey(0), ex, train=False)

    def run(quantize):
        model = ResUNet30(freq_fold=4, quantize=quantize)
        pl = SeparationInference(model, variables, IdentityModel._QE())
        ev = DCASEEvaluator(16000, csv_path, audio_dir, batch_size=3,
                            pad_seconds=1.0)
        if quantize:
            ev.calibrate(pl)
            assert "qpack" in pl.variables  # packed eval path
        return ev(pl)

    f_sisdr, f_sdri, f_sdr = run(False)
    q_sisdr, q_sdri, q_sdr = run(True)
    assert abs(q_sdr - f_sdr) < 0.1, (q_sdr, f_sdr)
    assert abs(q_sdri - f_sdri) < 0.1, (q_sdri, f_sdri)
    assert abs(q_sisdr - f_sisdr) < 0.1, (q_sisdr, f_sisdr)


def test_evaluator_quantized_heldout_queries(tmp_path, rng):
    """Held-out-query int8 gate (VERDICT r4 item 5): calibrate on one
    caption/row set, evaluate on a DISJOINT set, with a query encoder
    whose embeddings actually differ per caption (the base gate's zero
    embeddings make every FiLM condition identical, which is exactly the
    easy case). ops/quant.py's calibration notes claim per-lane activation
    ranges are FiLM-conditioned and swing across queries — this pins that
    the multi-batch amax protocol still holds 0.1 dB on queries never seen
    during calibration."""
    import jax
    import jax.numpy as jnp

    from lass_tpu.evaluation.dcase import SeparationInference
    from lass_tpu.models.resunet import ResUNet30

    class HashQE:
        """Deterministic per-caption unit-normal embeddings — distinct
        FiLM conditioning per query, disjoint across caption sets."""

        def get_query_embed(self, modality, text=None, **kw):
            import zlib

            out = np.stack([
                np.random.default_rng(zlib.crc32(t.encode()))
                .standard_normal(512).astype(np.float32)
                for t in text])
            return out / np.linalg.norm(out, axis=-1, keepdims=True)

    def write_split(split, row_ids):
        names = []
        for i in row_ids:
            for kind in ["src", "noise"]:
                name = f"{kind}{i}"
                path = tmp_path / f"{name}.wav"
                if not path.exists():
                    write_wav(str(path),
                              rng.randn(1, 16000).astype(np.float32) * 0.1,
                              16000)
            names.append(i)
        csv_path = tmp_path / f"eval_{split}.csv"
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["source", "noise", "snr", "caption"])
            for i in names:
                w.writerow([f"src{i}", f"noise{i}", str((i % 3) * 5 - 5),
                            f"{split} query about sound {i}"])
        return str(csv_path)

    calib_csv = write_split("calib", range(0, 4))
    heldout_csv = write_split("heldout", range(4, 8))

    ex = {"mixture": jnp.zeros((4, 1, 16000), jnp.float32),
          "condition": jnp.zeros((4, 512), jnp.float32)}
    variables = ResUNet30(freq_fold=4).init(
        jax.random.PRNGKey(0), ex, train=False)

    heldout_ev = DCASEEvaluator(16000, heldout_csv, str(tmp_path),
                                batch_size=4, pad_seconds=1.0)

    def run(quantize):
        model = ResUNet30(freq_fold=4, quantize=quantize)
        pl = SeparationInference(model, variables, HashQE())
        if quantize:
            # calibration sees ONLY the calib split's captions/rows
            DCASEEvaluator(16000, calib_csv, str(tmp_path), batch_size=4,
                           pad_seconds=1.0).calibrate(pl)
            assert "qpack" in pl.variables
        return heldout_ev(pl)

    f_sisdr, f_sdri, f_sdr = run(False)
    q_sisdr, q_sdri, q_sdr = run(True)
    assert abs(q_sdr - f_sdr) < 0.1, (q_sdr, f_sdr)
    assert abs(q_sdri - f_sdri) < 0.1, (q_sdri, f_sdri)
    assert abs(q_sisdr - f_sisdr) < 0.1, (q_sisdr, f_sisdr)


def test_separation_inference_mesh_parity(rng):
    """SeparationInference(mesh=8-device DP) == single-device output."""
    import jax
    import jax.numpy as jnp

    from lass_tpu.evaluation.dcase import SeparationInference
    from lass_tpu.models.resunet import ResUNet30
    from lass_tpu.parallel.mesh import make_mesh

    model = ResUNet30(freq_fold=4)
    batch = 8
    ex = {"mixture": jnp.zeros((batch, 1, 16000), jnp.float32),
          "condition": jnp.zeros((batch, 512), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), ex, train=False)

    class Enc:
        def get_query_embed(self, **kw):
            raise NotImplementedError

    mix = rng.randn(batch, 1, 16000).astype(np.float32) * 0.1
    cond = rng.randn(batch, 512).astype(np.float32)
    single = SeparationInference(model, variables, Enc())
    sharded = SeparationInference(model, variables, Enc(),
                                  mesh=make_mesh(jax.devices()[:8]))
    want = single.separate(mix, cond)
    got = sharded.separate(mix, cond)
    np.testing.assert_allclose(got, want, atol=1e-5)
