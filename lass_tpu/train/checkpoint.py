"""Orbax step-based checkpointing.

Replaces the reference's CheckpointEveryNSteps callback
(callbacks/base.py:22-35: save at step 1 and every save_step_frequency
steps, rank zero) and `load_from_checkpoint` (utils.py:356-400). Orbax
handles multi-host coordination and atomic writes natively.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_step_frequency: int = 20000,
                 max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_step_frequency = save_step_frequency
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=True,
            ),
        )

    def should_save(self, step: int) -> bool:
        # reference saves at global_step == 1 and every N (callbacks/base.py:28)
        return step == 1 or (step > 0 and step % self.save_step_frequency == 0)

    def maybe_save(self, step: int, state: Any) -> bool:
        if not self.should_save(step):
            return False
        self.save(step, state)
        return True

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: Any,
                step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract_state))
        except (ValueError, KeyError) as exc:
            # The optimizer-moment layout is an env-dependent choice
            # (LASS_TPU_FLAT_OPT: flat vector vs per-param tree,
            # train/optim.py:build_optimizer). A checkpoint saved under
            # the other layout fails orbax's structure match with an
            # opaque tree error — point at the knob explicitly.
            raise type(exc)(
                f"{exc}\n[lass_tpu] checkpoint restore failed on a tree-"
                f"structure mismatch. If this checkpoint was written with "
                f"the other optimizer-moment layout, set LASS_TPU_FLAT_OPT="
                f"{'0' if os.environ.get('LASS_TPU_FLAT_OPT', '1') == '1' else '1'} "
                f"(or pass flatten= to build_optimizer) and retry."
            ) from exc

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
