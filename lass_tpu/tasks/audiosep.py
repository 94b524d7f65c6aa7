"""AudioSep training task: pure jittable train steps.

Replaces the reference's Lightning module (models/audiosep.py:52-113): the
step mixes on device, conditions on a (frozen) query embedding, runs the
separator with batch-stat mutation, takes grads, and applies torch-exact
AMSGrad — all inside ONE compiled function. Batch sharding over the mesh's
'data' axis makes gradient/BN reduction implicit (the DDP analog).

Two step flavors:
- ``train_step``: batch = {'waveform', 'condition'}; mixing happens inside
  the jit (fastest path; right for text-only conditioning, the baseline —
  use_text_ratio=1.0, config/audiosep_base.yaml:30).
- ``train_step_premixed``: batch = {'mixture', 'segment', 'condition'};
  for hybrid/audio conditioning where the query encoder must see the mixed
  target segments first (reference audiosep.py:77-88), or for precomputed
  pipelines.

The query embedding enters as data: the CLAP encoder is frozen in the
reference (clap_encoder.py:38-41), so its forward is hoisted out of the
gradient path and runs in its own jit.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from lass_tpu.data.mixer import SegmentMixer
from lass_tpu.losses import get_loss_function


def _decode_wire(waveform: jax.Array) -> jax.Array:
    """Decode the host->device wire format (config train.wire_dtype).

    int16 batches carry PCM samples scaled by 32768 (the inverse of
    read_wav's 1/32768, audio/io.py:142); the cast-and-scale below is
    exact for PCM-sourced audio because 1/32768 is a power of two, and
    XLA fuses it into the first consumer. Float batches pass through.
    """
    if waveform.dtype == jnp.int16:
        return waveform.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    return waveform


def _flat_global_norm(tree) -> jax.Array:
    """L2 norm of a pytree as ONE fused reduction over the raveled
    vector. optax.global_norm's per-leaf sum-squares lower to ~hundreds
    of tiny scalar ops + f32[] copies per step on TPU; same value up to
    float reassociation (metric only — not in the update math)."""
    flat, _ = jax.flatten_util.ravel_pytree(tree)
    return jnp.sqrt(jnp.sum(jnp.square(flat)))


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


class AudioSepTask:
    def __init__(
        self,
        model,  # flax module with {'mixture','condition'} -> {'waveform'} API
        mixer: SegmentMixer,
        optimizer: optax.GradientTransformation,
        loss_fn: Optional[Callable] = None,
    ):
        self.model = model
        self.mixer = mixer
        self.optimizer = optimizer
        self.loss_fn = loss_fn or get_loss_function("l1_wav")

    def init_state(self, rng: jax.Array, segment_samples: int,
                   condition_size: int = 512) -> TrainState:
        dummy = {
            "mixture": jnp.zeros((1, 1, segment_samples)),
            "condition": jnp.zeros((1, condition_size)),
        }
        variables = self.model.init(rng, dummy, train=False)
        return TrainState(
            step=jnp.zeros([], jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.optimizer.init(variables["params"]),
        )

    def _update(self, state: TrainState, mixtures: jax.Array,
                segments: jax.Array, condition: jax.Array
                ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        condition = jax.lax.stop_gradient(condition)

        def compute_loss(params):
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                {"mixture": mixtures, "condition": condition},
                train=True, mutable=["batch_stats"])
            sep = out["waveform"][:, 0]
            loss = self.loss_fn({"segment": sep},
                                {"segment": segments[:, 0]})
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {
            "train_loss": loss,
            "grad_norm": _flat_global_norm(grads),
        }
        return new_state, metrics

    def train_step(
        self, state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """batch: {'waveform': (B, 1, L), 'condition': (B, 512)}."""
        step_key = jax.random.fold_in(rng, state.step)
        mixtures, segments = self.mixer(_decode_wire(batch["waveform"]),
                                        step_key)
        return self._update(state, mixtures, segments, batch["condition"])

    def train_step_premixed(
        self, state: TrainState, batch: Dict[str, jax.Array]
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """batch: {'mixture', 'segment': (B, 1, L), 'condition': (B, 512)}."""
        return self._update(state, batch["mixture"], batch["segment"],
                            batch["condition"])

    def mix(self, waveforms: jax.Array, rng: jax.Array, step: jax.Array
            ) -> Tuple[jax.Array, jax.Array]:
        """Standalone jittable mixing (for hybrid conditioning flows)."""
        return self.mixer(_decode_wire(waveforms),
                          jax.random.fold_in(rng, step))

    def eval_forward(self, state: TrainState,
                     batch: Dict[str, jax.Array]) -> jax.Array:
        """Inference forward with running BN stats (B, C, L) -> (B, C, L)."""
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False)
        return out["waveform"]
