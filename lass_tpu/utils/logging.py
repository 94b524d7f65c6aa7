"""Logging + metrics observability.

Reference surface: numbered file logs + console (utils.py:26-49), W&B
scalars (train.py:256-262, models/audiosep.py:111), TensorBoard dir. Here:
same numbered file+console logging, metrics to JSONL (always), W&B when the
package exists (not in this image — gated import), and jax.profiler trace
capture helpers (the reference has no profiler at all, SURVEY.md §5.1).
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional


def create_logging(log_dir: str, filemode: str = "w") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    i = 0
    while os.path.isfile(os.path.join(log_dir, f"{i:04d}.log")):
        i += 1
    path = os.path.join(log_dir, f"{i:04d}.log")
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(filename)s[line:%(lineno)d] %(levelname)s %(message)s",
        datefmt="%a, %d %b %Y %H:%M:%S",
        filename=path,
        filemode=filemode,
        force=True,
    )
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(logging.Formatter("%(name)-12s: %(levelname)-8s %(message)s"))
    logging.getLogger("").addHandler(console)
    return logging.getLogger("")


class MetricsLogger:
    """Step metrics -> JSONL file (+ W&B if importable)."""

    def __init__(self, log_dir: str, project: str = "LASS",
                 run_name: Optional[str] = None, config: Optional[Dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        try:
            import wandb  # optional; absent in this image

            self._wandb = wandb.init(project=project, name=run_name,
                                     config=config, dir=log_dir)
        except Exception:
            self._wandb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        record = {"step": int(step), "time": time.time(),
                  **{k: float(v) for k, v in metrics.items()}}
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


@contextlib.contextmanager
def profiler_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace around a training window (view with tensorboard
    or xprof). First-class feature the reference lacks (SURVEY.md §5.1)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
