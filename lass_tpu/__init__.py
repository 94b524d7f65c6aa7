"""lass_tpu — a TPU-native language-queried audio source separation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the LASS
(DCASE 2024 Task 9 / AudioSep) reference stack:

- ``lass_tpu.dsp``        — STFT/ISTFT/mel DSP primitives as fused MXU ops
- ``lass_tpu.nn``         — torch-semantics-compatible neural net layers (Flax)
- ``lass_tpu.models``     — ResUNet30 separators + CLAP query encoder
- ``lass_tpu.tasks``      — training-step builders (AudioSep & variants)
- ``lass_tpu.data``       — datasets, device-side mixing, precomputed STFTs
- ``lass_tpu.train``      — optimizers, schedules, train loop, checkpoints
- ``lass_tpu.parallel``   — device mesh / sharding utilities
- ``lass_tpu.evaluation`` — SDR metrics + DCASE T9 evaluator
- ``lass_tpu.convert``    — PyTorch checkpoint -> JAX pytree converters
"""

__version__ = "0.1.0"
