"""Loss registry (reference losses.py:1-17)."""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def l1(output: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(output.astype(jnp.float32)
                            - target.astype(jnp.float32)))


def l1_wav(output_dict: Dict, target_dict: Dict) -> jax.Array:
    return l1(output_dict["segment"], target_dict["segment"])


_LOSSES: Dict[str, Callable] = {"l1_wav": l1_wav}


def get_loss_function(loss_type: str) -> Callable:
    if loss_type not in _LOSSES:
        raise NotImplementedError(f"loss '{loss_type}' not registered")
    return _LOSSES[loss_type]
