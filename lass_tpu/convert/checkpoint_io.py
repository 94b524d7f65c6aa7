"""Checkpoint loading for inference — accepts either:
- an orbax checkpoint directory written by lass_tpu (TrainState), or
- a reference PyTorch Lightning .ckpt / .pt file (auto-converted).

This is the analog of reference utils.load_ss_model (utils.py:356-400,
strict=False CPU load with the separator injected).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _init_variables(model, segment_samples: int, condition_size: int):
    import jax.numpy as jnp

    dummy = {
        "mixture": jnp.zeros((1, 1, segment_samples)),
        "condition": jnp.zeros((1, condition_size)),
    }
    return model.init(jax.random.PRNGKey(0), dummy, train=False)


def load_torch_ckpt(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt/.pt into a numpy state dict (CPU, weights only)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach")
            else np.asarray(v) for k, v in blob.items()}


def load_inference_variables(model, checkpoint_path: str,
                             segment_samples: int,
                             condition_size: int = 512) -> Dict[str, Any]:
    """-> {'params': ..., 'batch_stats': ...} for model.apply."""
    import jax.numpy as jnp

    template = _init_variables(model, segment_samples, condition_size)

    if os.path.isdir(checkpoint_path):
        import orbax.checkpoint as ocp

        # orbax dir: either a manager root (pick latest step) or a step dir
        root = checkpoint_path
        name = os.path.basename(os.path.normpath(root))
        step: Optional[int] = int(name) if name.isdigit() else None
        if step is not None:
            root = os.path.dirname(os.path.normpath(root))
        mgr = ocp.CheckpointManager(os.path.abspath(root))
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {checkpoint_path}")
        # build the abstract tree from the STORED metadata (the optimizer
        # state shape is training-config dependent; we don't need to know it)
        meta = mgr.item_metadata(step)
        abstract = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta)
        state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        mgr.close()
        if hasattr(state, "params"):
            return {"params": state.params,
                    "batch_stats": state.batch_stats}
        return {"params": state["params"],
                "batch_stats": state["batch_stats"]}

    # torch checkpoint file -> convert
    from lass_tpu.convert.torch_to_jax import convert_resunet30
    from lass_tpu.models.film import resunet30_film_spec

    sd = load_torch_ckpt(checkpoint_path)
    converted = convert_resunet30(sd, resunet30_film_spec())
    # validate tree structure/shapes against the model template
    jax.tree_util.tree_map(
        lambda a, b: _check(a, b), template["params"], converted["params"])
    return {"params": jax.tree_util.tree_map(jnp.asarray,
                                             converted["params"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, converted["batch_stats"])}


def load_ss_model(configs, checkpoint_path: str, query_encoder=None,
                  quantize: bool = False):
    """API-parity wrapper (reference utils.load_ss_model, utils.py:356-400):
    build the separator from a config dict/Config and load a checkpoint
    (orbax dir or torch .ckpt), returning a SeparationInference ready for
    the DCASE evaluator.

    quantize=True builds the separator with the int8 MXU eval path
    (ops/quant.py); call .calibrate(mixtures, conditions) once before
    .separate()."""
    from lass_tpu.config import Config, _build
    from lass_tpu.evaluation.dcase import SeparationInference
    from lass_tpu.models.query_encoder import CLAPQueryEncoder
    from lass_tpu.train.loop import build_model

    cfg = configs if isinstance(configs, Config) else _build(Config, configs)
    model = build_model(cfg)
    if quantize:
        model = model.clone(quantize=True)
    variables = load_inference_variables(
        model, checkpoint_path, cfg.data.segment_samples,
        cfg.model.condition_size)
    return SeparationInference(model, variables,
                               query_encoder or CLAPQueryEncoder())


def load_npz_variables(path: str) -> Dict[str, Any]:
    """Load an npz parameter pack written by scripts/convert_checkpoint.py
    back into nested dicts keyed by the '/'-joined paths."""
    out: Dict[str, Any] = {}
    with np.load(path, allow_pickle=False) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out


def _check(expected, got):
    if tuple(expected.shape) != tuple(np.asarray(got).shape):
        raise ValueError(
            f"shape mismatch: expected {expected.shape}, got "
            f"{np.asarray(got).shape}")
    return got
