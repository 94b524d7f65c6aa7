"""Device mesh + sharding layout.

The reference's distributed story is Lightning DDP over NCCL
(train.py:266-283); the TPU-native equivalent is a jax.sharding.Mesh with a
'data' axis (batch sharding over ICI — gradient psum is implicit in the
sharded jit) and an optional 'model' axis for tensor parallelism of the
wide layers (FiLM fused kernel columns, high-channel conv kernels). BN
cross-replica sync (reference sync_batchnorm, train.py:278) falls out of
global-batch statistics under GSPMD — see lass_tpu/nn/layers.py.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel layout rules: shard wide output-channel dims over 'model'.
_TP_MIN_CHANNELS = 256


def _spec_for(path: str, value: jax.Array) -> P:
    if value.ndim == 2 and "film" in path and value.shape[-1] >= 1024:
        return P(None, MODEL_AXIS)  # fused FiLM kernel columns
    if value.ndim == 4 and value.shape[-1] >= _TP_MIN_CHANNELS:
        return P(None, None, None, MODEL_AXIS)  # conv kernel (kh,kw,in,out)
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedShardings for a param pytree (TP over 'model' where profitable).

    With model_parallel=1 every spec degenerates to replication, so the same
    code path serves pure-DP and DP+TP meshes.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def name_of(path):
        return "/".join(str(getattr(p, "key", p)) for p in path)

    specs = {}
    for path, value in flat:
        specs[name_of(path)] = NamedSharding(mesh, _spec_for(name_of(path),
                                                             value))

    def lookup(path, value):
        return specs[name_of(path)]

    return jax.tree_util.tree_map_with_path(lookup, params)
