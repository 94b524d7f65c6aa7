"""Training tasks for the precomputed-STFT variants.

Behavioral specs:
- Multi-STFT task: reference models/audiosep_with_multistft.py:79-128 —
  consume precomputed {win: (mag, cos, sin)} mixture STFTs, text-only
  conditioning, L1 waveform loss; plus a validation step (:130-141).
- Neg-query task: reference models/audiosep_with_neg_query.py:43-122 —
  dual captions (negative = 2nd mixture-component text, '' fallback),
  fixed 512-window STFT, pos+neg embedding fusion. The reference fuses via
  a LAZILY-created Linear(1024, 512, bias=False) that is never trained or
  saved ('clap_encoder with_neg_query.py':128-143); here the fusion is a
  real trainable parameter inside the task state (SURVEY.md §7 quirk 4).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lass_tpu.tasks.audiosep import TrainState


def negative_captions(pos_caps, mixture_component_texts) -> list:
    """reference audiosep_with_neg_query.py:57-70."""
    if mixture_component_texts is None:
        return [""] * len(pos_caps)
    negs = [lst[1] if isinstance(lst, (list, tuple)) and len(lst) > 1 else ""
            for lst in mixture_component_texts]
    if len(negs) != len(pos_caps):
        negs = (negs + [""] * len(pos_caps))[:len(pos_caps)]
    return negs


class NegQueryFusion(nn.Module):
    """concat(pos, neg) -> joint space; trainable (unlike the reference's
    random never-saved projection)."""

    joint_embed_dim: int = 512

    @nn.compact
    def __call__(self, pos: jax.Array, neg: jax.Array) -> jax.Array:
        fused = jnp.concatenate([pos, neg], axis=-1)
        out = nn.Dense(self.joint_embed_dim, use_bias=False,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="fusion")(fused)
        norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out / jnp.maximum(norm, 1e-12)


def _stft_input(batch: Dict, wins) -> Dict[str, Dict[int, jax.Array]]:
    mix = batch["stfts"]["mixture"]
    return {
        "stft_mixture_mag": {w: mix[w][0] for w in wins},
        "stft_mixture_cos": {w: mix[w][1] for w in wins},
        "stft_mixture_sin": {w: mix[w][2] for w in wins},
    }


class MultiSTFTAudioSepTask:
    """Train/val steps over precomputed multi-window batches."""

    def __init__(self, model, optimizer: optax.GradientTransformation,
                 loss_fn: Optional[Callable] = None):
        self.model = model
        self.optimizer = optimizer
        self.loss_fn = loss_fn or (
            lambda o, t: jnp.mean(jnp.abs(o - t)))
        self.wins = tuple(model.win_lengths)

    def init_state(self, rng: jax.Array, example_batch: Dict,
                   condition_size: int = 512) -> TrainState:
        inputs = _stft_input(example_batch, self.wins)
        inputs["condition"] = jnp.zeros(
            (example_batch["target_waveform"].shape[0], condition_size))
        length = example_batch["target_waveform"].shape[-1]
        variables = self.model.init(rng, inputs, length, train=False)
        return TrainState(
            step=jnp.zeros([], jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.optimizer.init(variables["params"]),
        )

    def _forward_loss(self, params, batch_stats, batch, condition, train):
        inputs = _stft_input(batch, self.wins)
        inputs["condition"] = jax.lax.stop_gradient(condition)
        target = batch["target_waveform"][:, 0]
        length = target.shape[-1]
        if train:
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                inputs, length, train=True, mutable=["batch_stats"])
            loss = self.loss_fn(out["waveform"][:, 0], target)
            return loss, mutated["batch_stats"]
        out = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            inputs, length, train=False)
        return self.loss_fn(out["waveform"][:, 0], target), batch_stats

    def train_step(self, state: TrainState, batch: Dict,
                   condition: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        def compute(params):
            return self._forward_loss(params, state.batch_stats, batch,
                                      condition, True)

        (loss, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, new_opt = self.optimizer.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, new_params, new_stats, new_opt),
                {"train_loss": loss, "grad_norm": optax.global_norm(grads)})

    def val_step(self, state: TrainState, batch: Dict,
                 condition: jax.Array) -> jax.Array:
        loss, _ = self._forward_loss(state.params, state.batch_stats, batch,
                                     condition, False)
        return loss


class NegQueryAudioSepTask(MultiSTFTAudioSepTask):
    """512-window precomputed STFTs + trainable pos/neg query fusion.

    The separator model should be a single-window MultiSTFTResUNet30
    (win_lengths=(512,)) per the reference's desired_win_len=512
    (audiosep_with_neg_query.py:90-94).
    """

    def __init__(self, model, optimizer, loss_fn: Optional[Callable] = None,
                 joint_embed_dim: int = 512):
        super().__init__(model, optimizer, loss_fn)
        self.fusion = NegQueryFusion(joint_embed_dim)

    def init_state(self, rng: jax.Array, example_batch: Dict,
                   condition_size: int = 512) -> TrainState:
        base = super().init_state(rng, example_batch, condition_size)
        dummy = jnp.zeros((1, condition_size))
        fusion_params = self.fusion.init(rng, dummy, dummy)["params"]
        params = dict(base.params)
        params["neg_query_fusion"] = fusion_params
        return TrainState(base.step, params, base.batch_stats,
                          self.optimizer.init(params))

    def _forward_loss(self, params, batch_stats, batch, condition, train):
        # condition here is (pos_embed, neg_embed); fusion IS trainable
        pos, neg = condition
        fused = self.fusion.apply(
            {"params": params["neg_query_fusion"]},
            jax.lax.stop_gradient(pos), jax.lax.stop_gradient(neg))
        model_params = {k: v for k, v in params.items()
                        if k != "neg_query_fusion"}
        inputs = _stft_input(batch, self.wins)
        inputs["condition"] = fused
        target = batch["target_waveform"][:, 0]
        length = target.shape[-1]
        if train:
            out, mutated = self.model.apply(
                {"params": model_params, "batch_stats": batch_stats},
                inputs, length, train=True, mutable=["batch_stats"])
            return (self.loss_fn(out["waveform"][:, 0], target),
                    mutated["batch_stats"])
        out = self.model.apply(
            {"params": model_params, "batch_stats": batch_stats},
            inputs, length, train=False)
        return self.loss_fn(out["waveform"][:, 0], target), batch_stats
