from lass_tpu.nn.layers import BatchNorm, conv2d, conv_transpose2d, dense
from lass_tpu.nn.blocks import ConvBlockRes, EncoderBlockRes1B, DecoderBlockRes1B

__all__ = [
    "BatchNorm",
    "conv2d",
    "conv_transpose2d",
    "dense",
    "ConvBlockRes",
    "EncoderBlockRes1B",
    "DecoderBlockRes1B",
]
