"""DCASE T9 evaluation CLI — same surface as reference dcase_evaluator.py:
build a DCASEEvaluator over (csv, audio_dir) and run a checkpoint.

    python dcase_evaluator.py --checkpoint_path CKPT \
        --eval_indexes lass_synthetic_validation.csv \
        --audio_dir lass_validation [--config_yaml config/audiosep_base.yaml]
"""
import argparse

import jax
import numpy as np

from lass_tpu.evaluation.dcase import DCASEEvaluator, SeparationInference
from lass_tpu.models.query_encoder import CLAPQueryEncoder


def eval(evaluator: DCASEEvaluator, checkpoint_path: str,
         config_yaml: str = "config/audiosep_base.yaml",
         query_encoder: CLAPQueryEncoder = None,
         data_parallel: bool = False, quantize: bool = False,
         dsp_precision: str = None):
    """Reference-compatible harness (dcase_evaluator.py:126-145).

    quantize=True runs the separator on the int8 MXU path (ops/quant.py),
    calibrated on the first eval batch — the SDR delta vs a float run
    quantifies the PTQ quality cost on a real checkpoint."""
    from lass_tpu.config import load_config
    from lass_tpu.tasks.audiosep import TrainState
    from lass_tpu.train.loop import build_model
    from lass_tpu.convert.checkpoint_io import load_inference_variables

    cfg = load_config(config_yaml)
    if dsp_precision:
        cfg.model.dsp_precision = dsp_precision
    model = build_model(cfg)
    if quantize:
        model = model.clone(quantize=True)
    variables = load_inference_variables(model, checkpoint_path,
                                         cfg.data.segment_samples,
                                         cfg.model.condition_size)
    query_encoder = query_encoder or CLAPQueryEncoder()
    mesh = None
    if data_parallel:
        import jax

        from lass_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices())
    pl_model = SeparationInference(model, variables, query_encoder,
                                   mesh=mesh)
    if quantize:
        evaluator.calibrate(pl_model)

    print("-------  Start Evaluation  -------")
    sisdr, sdri, sdr = evaluator(pl_model)
    print(f"SDR: {sdr:.3f}, SDRi: {sdri:.3f}, SISDR: {sisdr:.3f}")
    print("-------------------------  Done  ---------------------------")
    return sisdr, sdri, sdr


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("--config_yaml", type=str,
                        default="config/audiosep_base.yaml")
    parser.add_argument("--eval_indexes", type=str,
                        default="lass_synthetic_validation.csv")
    parser.add_argument("--audio_dir", type=str, default="lass_validation")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard eval batches over all devices "
                        "(the device count must divide batch_size)")
    parser.add_argument("--quantize", action="store_true",
                        help="int8 MXU separator (PTQ calibrated on the "
                        "first eval batch)")
    parser.add_argument("--dsp_precision", default=None,
                        choices=["default", "high", "highest"],
                        help="MXU passes for the STFT/ISTFT/mask matmuls "
                             "(overrides config; 'default' is the fast "
                             "production setting)")
    args = parser.parse_args()

    evaluator = DCASEEvaluator(
        sampling_rate=16000,
        eval_indexes=args.eval_indexes,
        audio_dir=args.audio_dir,
        batch_size=args.batch_size,
    )
    eval(evaluator, args.checkpoint_path, args.config_yaml,
         data_parallel=args.data_parallel, quantize=args.quantize,
         dsp_precision=args.dsp_precision)


if __name__ == "__main__":
    main()
