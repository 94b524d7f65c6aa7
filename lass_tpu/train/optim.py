"""Optimizer + LR schedules (reference models/audiosep.py:118-145,
optimizers/lr_schedulers.py:5-101) as optax transforms.

The reference uses torch AdamW(amsgrad=True, weight_decay=0) with a
per-step LambdaLR multiplier; here that is optax.amsgrad scaled by an
equivalent jnp schedule (branchless, jit-safe).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax


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


def get_lr_schedule(lr_lambda_type: str, warm_up_steps: int,
                    reduce_lr_steps: int) -> Callable:
    if lr_lambda_type == "linear_warm_up":
        return linear_warm_up(warm_up_steps, reduce_lr_steps)
    if lr_lambda_type == "constant_warm_up":
        return constant_warm_up(warm_up_steps, reduce_lr_steps)
    raise NotImplementedError(f"lr_lambda_type '{lr_lambda_type}'")


def build_optimizer(
    optimizer_type: str,
    learning_rate: float,
    lr_lambda_type: str,
    warm_up_steps: int,
    reduce_lr_steps: int,
) -> optax.GradientTransformation:
    if optimizer_type != "AdamW":
        raise NotImplementedError(f"optimizer '{optimizer_type}'")
    lam = get_lr_schedule(lr_lambda_type, warm_up_steps, reduce_lr_steps)
    # torch AdamW with weight_decay=0.0 and amsgrad=True == optax.amsgrad
    # (betas 0.9/0.999, eps 1e-8 — reference models/audiosep.py:122-130)
    return optax.amsgrad(
        learning_rate=lambda step: learning_rate * lam(step),
        b1=0.9, b2=0.999, eps=1e-8)
