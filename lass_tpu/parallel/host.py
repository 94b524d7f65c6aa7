"""Multi-host (multi-process) scaffolding.

The reference's analog is Lightning's DDP launch (train.py:266-283:
`num_nodes`, one process per device, NCCL init from env) and the CLAP
harness's manual SLURM/OMPI/torchrun process-group init
(models/CLAP/training/distributed.py:24-150). The TPU-native design
(SURVEY.md §5.8): one process per HOST, `jax.distributed.initialize()`
wires the coordinator, a global Mesh spans all hosts' devices, and GSPMD
inserts the collectives — there is no explicit process group to manage.

Data flows host-parallel: every host computes the SAME global epoch
permutation (seeded), takes its process_index-strided slice, and assembles
its host-local shard of each global batch; `put_global_batch` builds the
global sharded array from per-host shards
(jax.make_array_from_process_local_data).
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger("lass_tpu.parallel.host")


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         rendezvous_timeout_s: Optional[int] = None) -> None:
    """Call once per process before any jax op on multi-host deployments.

    On TPU pods jax.distributed.initialize() auto-discovers everything from
    the metadata server; explicit args are for CPU/GPU clusters. A no-arg
    call in a single-process run is skipped (keeps the single-host path
    dependency-free — the reference likewise only inits DDP when launched
    distributed). rendezvous_timeout_s bounds the coordinator rendezvous
    (default: jax's 300 s; LASS_TPU_RENDEZVOUS_TIMEOUT_S overrides) —
    workers on a loaded host can take minutes to reach initialize()."""
    if coordinator_address is None and num_processes is None:
        logger.info("single-process run: skipping "
                    "jax.distributed.initialize()")
        return
    # NOTE: must run before ANY backend-initializing jax call (including
    # jax.process_count/jax.devices), so the already-initialized check
    # reads the distributed client state directly
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # already initialized
    if rendezvous_timeout_s is None:
        env = os.environ.get("LASS_TPU_RENDEZVOUS_TIMEOUT_S")
        rendezvous_timeout_s = int(env) if env else None
    kwargs = {}
    if rendezvous_timeout_s is not None:
        kwargs["initialization_timeout"] = rendezvous_timeout_s
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    logger.info("multi-host initialized: process %d/%d, %d local devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count())


def host_info() -> tuple:
    return jax.process_index(), jax.process_count()


def shard_indices_for_host(indices: np.ndarray, process_index: int,
                           process_count: int) -> np.ndarray:
    """Strided per-host slice of a global epoch permutation. Every host
    sees a disjoint subset; the remainder is dropped so all hosts run the
    same number of steps (the DistributedSampler analog,
    reference train.py:277 use_distributed_sampler)."""
    if process_count <= 1:
        return indices
    usable = (len(indices) // process_count) * process_count
    return indices[process_index:usable:process_count]


def put_global_batch(batch: Dict[str, np.ndarray], sharding) -> Dict:
    """Host-local batch shards -> one global sharded array per key.

    Single-process: plain device_put. Multi-host: each process passes its
    LOCAL shard (global_batch / process_count rows) and
    jax.make_array_from_process_local_data assembles the global array on
    the mesh without any cross-host copy of data a host doesn't own."""
    import jax.numpy as jnp

    if jax.process_count() <= 1:
        return {k: jax.device_put(jnp.asarray(v), sharding)
                for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
