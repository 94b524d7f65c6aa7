"""Orbax step-based checkpointing.

Replaces the reference's CheckpointEveryNSteps callback
(callbacks/base.py:22-35: save at step 1 and every save_step_frequency
steps, rank zero) and `load_from_checkpoint` (utils.py:356-400). Orbax
handles multi-host coordination and atomic writes natively.
"""
from __future__ import annotations

import functools
import os
import threading
import time
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

# device->host fetch slice size for background saves (see save_async):
# small enough that training-step uploads interleave between slices on
# bandwidth-constrained host<->device links, large enough that per-slice
# round-trip overhead stays negligible
_FETCH_CHUNK_BYTES = 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("size",))
def _dyn_slice(arr, start, size: int):
    # dynamic START, static SIZE: every chunk of a given leaf shape
    # reuses ONE compiled executable (a static python-slice per chunk
    # would trigger a fresh — minutes-long, remote — compile each time)
    return jax.lax.dynamic_slice_in_dim(arr.reshape(-1), start, size, 0)


def _fetch_chunked(leaf):
    """Fetch one array device->host in <=_FETCH_CHUNK_BYTES slices.

    Big leaves (the flat AMSGrad moment vectors are ~120 MB each,
    train/optim.py) would otherwise occupy the transfer link in one
    uninterruptible burst. Slicing on device is a trivial copy; values
    are byte-identical to a whole-array device_get.
    """
    if not isinstance(leaf, jax.Array) or leaf.nbytes <= _FETCH_CHUNK_BYTES:
        return np.asarray(jax.device_get(leaf))
    n = int(np.prod(leaf.shape))
    rows = max(1, _FETCH_CHUNK_BYTES // leaf.dtype.itemsize)
    out = np.empty((n,), leaf.dtype)
    for i in range(0, n, rows):
        # dynamic_slice clamps the start, so the FINAL window is shifted
        # to end exactly at n instead of changing shape; its leading rows
        # overwrite already-written values with the same bytes
        start = min(i, n - rows)
        chunk = _dyn_slice(leaf, start, rows)
        chunk.copy_to_host_async()
        out[start:start + rows] = np.asarray(jax.device_get(chunk))
    return out.reshape(leaf.shape)


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
        # async-save accounting (read by bench.py's sustained decomposition)
        self._saver: Optional[threading.Thread] = None
        self._saver_error: Optional[BaseException] = None
        self.blocked_seconds = 0.0   # main-thread time spent inside saves
        self.save_seconds = 0.0      # background fetch+serialize time
        self.save_count = 0

    def should_save(self, step: int) -> bool:
        # reference saves at global_step == 1 and every N (callbacks/base.py:28)
        return step == 1 or (step > 0 and step % self.save_step_frequency == 0)

    def maybe_save(self, step: int, state: Any) -> bool:
        if not self.should_save(step):
            return False
        self.save(step, state)
        return True

    def save(self, step: int, state: Any) -> None:
        t0 = time.perf_counter()
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        dt = time.perf_counter() - t0
        self.blocked_seconds += dt
        self.save_seconds += dt
        self.save_count += 1

    def save_async(self, step: int, state: Any) -> None:
        """Non-blocking save: the device->host fetch runs off the main
        thread so training steps keep dispatching underneath it.

        Orbax's own "async" save still performs the device->host snapshot
        synchronously before returning (it must — callers may mutate/donate
        the state right after save()); over the axon tunnel that fetch is
        tens of seconds and was the dominant sustained-training stall
        (BENCH_r04: one 37.4 s blocking save inside a 200-step run). Here
        the main thread only enqueues `copy_to_host_async` on every leaf
        (microseconds) and hands the references to a saver thread, which
        completes the fetch (`jax.device_get` just awaits the already-
        running copies) and writes through orbax on host arrays.

        CONTRACT: `state`'s arrays must stay valid for the lifetime of the
        background fetch — pass a device-side snapshot (jnp.copy tree) when
        the training loop donates its state buffers (train/loop.py does).
        Multi-host runs fall back to the blocking path: orbax needs the
        sharded jax.Arrays to coordinate a distributed save.

        At most one save is in flight; a second save joins the first.
        Background errors re-raise on the next save_async()/wait() call.

        The fetch is CHUNKED (~8 MB slices): enqueueing the whole
        ~450 MB state as one burst of copies monopolized the tunnel's
        transfer queue, stalling the training loop's per-step batch
        uploads (and even scalar metric fetches) for tens of seconds
        behind checkpoint traffic (BENCH_r04 metrics_fetch 44.9 s over
        10 fetches). Fetching slice-by-slice leaves gaps where step
        traffic interleaves; the save takes slightly longer, the step
        loop barely notices it.
        """
        if jax.process_count() > 1:
            self.save(step, state)
            return
        t0 = time.perf_counter()
        self._join_saver()

        def work():
            w0 = time.perf_counter()
            try:
                host_state = jax.tree_util.tree_map(_fetch_chunked, state)
                self._mgr.save(step, args=ocp.args.StandardSave(host_state))
                # finalize orbax's own async write HERE so its errors are
                # caught by this thread (they would otherwise escape raw
                # from a later wait_until_finished on the main thread)
                self._mgr.wait_until_finished()
            except BaseException as exc:  # re-raised at next join
                self._saver_error = exc
            finally:
                self.save_seconds += time.perf_counter() - w0

        self._saver = threading.Thread(target=work, daemon=True,
                                       name=f"ckpt-save-{step}")
        self._saver.start()
        self.blocked_seconds += time.perf_counter() - t0
        self.save_count += 1

    def _join_saver(self) -> None:
        if self._saver is not None:
            self._saver.join()
            self._saver = None
        if self._saver_error is not None:
            exc, self._saver_error = self._saver_error, None
            raise RuntimeError("background checkpoint save failed") from exc

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
        self._join_saver()
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
