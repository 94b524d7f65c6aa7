"""Convert reference PyTorch checkpoints into lass_tpu npz parameter packs.

    # AudioSep separation checkpoint (Lightning .ckpt with ss_model.* keys)
    python scripts/convert_checkpoint.py --kind audiosep \
        --input audiosep,baseline-16k,step=200000.ckpt --output audiosep.npz

    # CLAP checkpoint (text + audio branches)
    python scripts/convert_checkpoint.py --kind clap \
        --input music_speech_audioset_epoch_15_esc_89.98.pt --output clap.npz

The npz packs store flattened pytrees ('/'-joined paths); load with
lass_tpu.convert.checkpoint_io.load_npz_variables.
"""
import argparse

import numpy as np


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", required=True,
                        choices=["audiosep", "clap", "roberta"])
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    from lass_tpu.convert.checkpoint_io import load_torch_ckpt
    from lass_tpu.convert.torch_to_jax import (
        convert_clap_audio_encoder, convert_clap_text_encoder,
        convert_hf_roberta_state, convert_resunet30)
    from lass_tpu.models.film import resunet30_film_spec

    sd = load_torch_ckpt(args.input)
    if args.kind == "audiosep":
        variables = convert_resunet30(sd, resunet30_film_spec())
        payload = {**{f"params/{k}": v for k, v in
                      flatten(variables["params"]).items()},
                   **{f"batch_stats/{k}": v for k, v in
                      flatten(variables["batch_stats"]).items()}}
    elif args.kind == "clap":
        text = convert_clap_text_encoder(sd)
        audio = convert_clap_audio_encoder(sd)
        payload = {**{f"text/params/{k}": v for k, v in
                      flatten(text).items()},
                   **{f"audio/params/{k}": v for k, v in
                      flatten(audio["params"]).items()},
                   **{f"audio/batch_stats/{k}": v for k, v in
                      flatten(audio["batch_stats"]).items()}}
    else:
        payload = {f"params/{k}": v for k, v in
                   flatten(convert_hf_roberta_state(sd, 12)).items()}

    np.savez(args.output, **payload)
    print(f"wrote {len(payload)} arrays to {args.output}")


if __name__ == "__main__":
    main()
