"""AudioSep training task: one pure jittable train step.

Replaces the reference's Lightning module (models/audiosep.py:52-113): the
step mixes on device, conditions on a (frozen) query embedding, runs the
separator with batch-stat mutation, takes grads, and applies torch-exact
AMSGrad — all inside ONE compiled function. Batch sharding over the mesh's
'data' axis makes gradient/BN reduction implicit (the DDP analog).

The query embedding enters as `batch['condition']`: the CLAP encoder is
frozen in the reference (clap_encoder.py:38-41), so its forward is hoisted
out of the gradient path and can run in its own jit (or fused later); the
hybrid text/audio modality choice (audiosep.py:82-88) happens there.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from lass_tpu.data.mixer import SegmentMixer
from lass_tpu.losses import get_loss_function


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

    def train_step(
        self, state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """batch: {'waveform': (B, 1, L), 'condition': (B, 512)}."""
        step_key = jax.random.fold_in(rng, state.step)
        mixtures, segments = self.mixer(batch["waveform"], step_key)
        condition = jax.lax.stop_gradient(batch["condition"])

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
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    def eval_forward(self, state: TrainState,
                     batch: Dict[str, jax.Array]) -> jax.Array:
        """Inference forward with running BN stats (B, C, L) -> (B, C, L)."""
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False)
        return out["waveform"]
