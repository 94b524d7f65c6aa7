"""Language-queried separation CLI: mixture wav + caption -> separated wav.

The user-facing inference entry the reference exposes only through code
(AudioSep pipeline / chunk_inference). Long inputs are handled with
batched overlapping windows.

    python separate.py --checkpoint_path CKPT --input mix.wav \
        --query "a dog barking" --output sep.wav \
        [--config_yaml config/audiosep_base.yaml] [--chunked]
"""
import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--query", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--config_yaml", default="config/audiosep_base.yaml")
    parser.add_argument("--chunked", action="store_true",
                        help="overlapped-window inference for long audio")
    parser.add_argument("--quantize", action="store_true",
                        help="int8 MXU inference (PTQ, calibrated on the "
                             "input itself — ops/quant.py)")
    parser.add_argument("--dsp_precision", default=None,
                        choices=["default", "high", "highest"],
                        help="MXU passes for the STFT/ISTFT/mask matmuls "
                             "(overrides config; 'default' is the fast "
                             "production setting)")
    args = parser.parse_args()

    import numpy as np

    from lass_tpu.audio.io import read_audio, write_wav
    from lass_tpu.audio.resample import resample_np
    from lass_tpu.config import load_config
    from lass_tpu.convert.checkpoint_io import load_ss_model

    cfg = load_config(args.config_yaml)
    if args.dsp_precision:
        cfg.model.dsp_precision = args.dsp_precision
    model = load_ss_model(cfg, args.checkpoint_path,
                          quantize=args.quantize)

    audio, sr = read_audio(args.input, mono=True)
    wave = audio[0]
    if sr != cfg.data.sampling_rate:
        wave = resample_np(wave, sr, cfg.data.sampling_rate)

    condition = np.asarray(model.query_encoder.get_query_embed(
        "text", text=[args.query]))

    if args.quantize:
        # calibrate on the (query-conditioned) input itself: the tightest
        # possible amax coverage for this separation
        seg = cfg.data.segment_samples
        head = np.zeros((1, 1, seg), np.float32)
        n = min(seg, len(wave))
        head[0, 0, :n] = wave[:n]
        model.calibrate(head, condition)

    if args.chunked:
        separated = model.separate_long(
            wave[None, None, :].astype(np.float32), condition)[0]
    else:
        separated = model.separate(
            wave[None, None, :].astype(np.float32), condition)[0, 0]

    write_wav(args.output, separated[None, :], cfg.data.sampling_rate)
    duration = len(separated) / cfg.data.sampling_rate
    print(f"wrote {args.output} ({duration:.1f}s at "
          f"{cfg.data.sampling_rate} Hz)")


if __name__ == "__main__":
    main()
