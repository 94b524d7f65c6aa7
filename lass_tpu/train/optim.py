"""Optimizer + LR schedules (reference models/audiosep.py:118-145,
optimizers/lr_schedulers.py:5-101) as optax transforms.

The reference uses torch AdamW(amsgrad=True, weight_decay=0) with a
per-step LambdaLR multiplier; here that is optax.amsgrad scaled by an
equivalent jnp schedule (branchless, jit-safe).
"""
from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class TorchAmsgradState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_torch_amsgrad(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8) -> optax.GradientTransformation:
    """Torch-semantics AMSGrad: running max over the RAW second moment,
    bias-correction applied afterward. optax.amsgrad maxes the
    bias-corrected moment instead and diverges from torch by ~1e-3/step
    (verified in tests/test_mixer_losses_optim.py)."""

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return TorchAmsgradState(
            count=jnp.zeros([], jnp.int32),
            mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu_max=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, updates)
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree_util.tree_map(
            lambda m, vmax: (m / bc1) / (jnp.sqrt(vmax / bc2) + eps),
            mu, nu_max)
        return new_updates, TorchAmsgradState(count, mu, nu, nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def opt_shardings(opt_state, p_shard, rep, model_parallel: int = 1):
    """Shardings for the (scale_by_torch_amsgrad, lr-scale) opt state.

    Flat moments (optax.flatten, build_optimizer flatten=True) are ONE
    concatenated vector — replicate it (under pure DP that equals the
    per-param shardings; under TP the flat buffer can't follow them, so
    optimizer memory stops being sharded — warned below). Tree-form
    moments follow the per-param shardings. Shared by train/loop.py and
    __graft_entry__.py so the layout logic cannot drift.
    """
    ams, rest = opt_state
    flat = isinstance(ams.mu, jax.Array)
    if flat and model_parallel > 1:
        # only reachable by FORCING LASS_TPU_FLAT_OPT=1 under TP —
        # build_optimizer auto-selects tree-form moments when
        # model_parallel > 1 precisely so optimizer memory shards
        import logging

        logging.getLogger("lass_tpu.optim").warning(
            "flat optimizer moments are fully REPLICATED under tensor "
            "parallelism (model_parallel=%d) — optimizer memory is not "
            "sharded. Set LASS_TPU_FLAT_OPT=0 (or build_optimizer("
            "flatten=False)) for per-param moment sharding at larger TP.",
            model_parallel)
    moment = rep if flat else p_shard
    return (TorchAmsgradState(count=rep, mu=moment, nu=moment,
                              nu_max=moment),
            jax.tree_util.tree_map(lambda _: rep, rest))


def linear_warm_up(warm_up_steps: int, reduce_lr_steps: int) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warm_up_steps
        decay = 0.9 ** jnp.floor(step / reduce_lr_steps)
        return jnp.where(step <= warm_up_steps, warm, decay)

    return schedule


def constant_warm_up(warm_up_steps: int, reduce_lr_steps: int) -> Callable:
    del reduce_lr_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(
            step < warm_up_steps, 1e-3,
            jnp.where(step < 2 * warm_up_steps, 1e-2,
                      jnp.where(step < 3 * warm_up_steps, 1e-1, 1.0)))

    return schedule


def cosine_warm_up(warm_up_steps: int, total_steps: int) -> Callable:
    """Linear warmup then cosine decay to 0 — the CLAP pretraining schedule
    (reference models/CLAP/training/scheduler.py:13-24). Returns the
    LR MULTIPLIER (the reference multiplies base_lr inside)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (step + 1) / warm_up_steps
        e = step - warm_up_steps
        es = max(total_steps - warm_up_steps, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e / es))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def get_lr_schedule(lr_lambda_type: str, warm_up_steps: int,
                    reduce_lr_steps: int) -> Callable:
    if lr_lambda_type == "linear_warm_up":
        return linear_warm_up(warm_up_steps, reduce_lr_steps)
    if lr_lambda_type == "constant_warm_up":
        return constant_warm_up(warm_up_steps, reduce_lr_steps)
    if lr_lambda_type == "cosine_warm_up":
        # reduce_lr_steps doubles as the total step count for the cosine
        return cosine_warm_up(warm_up_steps, reduce_lr_steps)
    raise NotImplementedError(f"lr_lambda_type '{lr_lambda_type}'")


def build_optimizer(
    optimizer_type: str,
    learning_rate: float,
    lr_lambda_type: str,
    warm_up_steps: int,
    reduce_lr_steps: int,
    flatten: Optional[bool] = None,
    model_parallel: int = 1,
) -> optax.GradientTransformation:
    if optimizer_type != "AdamW":
        raise NotImplementedError(f"optimizer '{optimizer_type}'")
    lam = get_lr_schedule(lr_lambda_type, warm_up_steps, reduce_lr_steps)
    # torch AdamW with weight_decay=0.0 and amsgrad=True (betas 0.9/0.999,
    # eps 1e-8 — reference models/audiosep.py:122-130), LambdaLR per-step
    tx = optax.chain(
        scale_by_torch_amsgrad(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(
            lambda step: learning_rate * lam(step)))
    if flatten is None:
        env = os.environ.get("LASS_TPU_FLAT_OPT")
        if env is not None:
            flatten = env == "1"
        else:
            # flat moments win on single-chip/DP (one fused elementwise
            # update instead of ~450 tiny staged ops) but CANNOT follow
            # per-param TP shardings — optimizer memory would replicate
            # (opt_shardings above). Tree-form under TP shards moments
            # exactly like their params.
            flatten = model_parallel == 1
    if flatten:
        # Run the (purely elementwise) update on ONE concatenated vector:
        # per-tensor updates over ~450 small arrays spend 126 ms/step on
        # v5e staging each tiny tensor through scratch memory (~3k async
        # copies/step, measured via scripts/xplane_groups.py); the flat
        # form is a handful of big fused ops. Bitwise-identical math.
        # Moment buffers become flat vectors — shard them replicated under
        # TP (opt_shardings above handles both layouts).
        tx = optax.flatten(tx)
    return tx
