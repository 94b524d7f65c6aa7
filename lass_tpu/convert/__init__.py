from lass_tpu.convert.torch_to_jax import (
    convert_resunet30,
    convert_clap_text_encoder,
    convert_hf_roberta_state,
)

__all__ = [
    "convert_resunet30",
    "convert_clap_text_encoder",
    "convert_hf_roberta_state",
]
