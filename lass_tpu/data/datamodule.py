"""Host input pipeline: shuffled epochs, parallel decode, safe collate,
background prefetch.

Replaces the reference's torch DataLoader + Lightning DataModule
(data/datamodules.py:8-122). Differences by design:
- bad items (None) are filtered AND topped up from a reserve iterator so
  every batch is full and static-shaped — jit-friendly, no loader crash
  (the reference collate_fn would KeyError on None, SURVEY.md §5.3);
- decoding runs in a thread pool (numpy decode releases the GIL in
  np.frombuffer/einsum paths) with a bounded prefetch queue, so host IO
  overlaps device compute.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate(items: List[Dict]) -> Dict:
    """Reference collate shape (data/datamodules.py:85-122):
    {'audio_text': {'text': [...], 'waveform': (B, 1, L), ...}}."""
    out = {
        "text": [it["text"] for it in items],
        "waveform": np.stack([it["waveform"] for it in items]),
        "modality": "audio_text",
        "original_audiopath": [it["original_audiopath"] for it in items],
    }
    return {"audio_text": out}


class DataModule:
    def __init__(self, train_dataset, batch_size: int, num_workers: int = 8,
                 seed: int = 1234, prefetch: int = 4,
                 process_index: int = 0, process_count: int = 1):
        """batch_size is the PER-HOST batch. With process_count > 1 every
        host computes the same seeded global permutation and takes its
        disjoint strided slice (the DistributedSampler analog — reference
        train.py:277)."""
        self.train_dataset = train_dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count

    def setup(self, stage: Optional[str] = None) -> None:  # API parity
        pass

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        from lass_tpu.parallel.host import shard_indices_for_host

        rng = np.random.default_rng(self.seed + epoch)
        idx = np.arange(len(self.train_dataset))
        rng.shuffle(idx)
        return shard_indices_for_host(idx, self.process_index,
                                      self.process_count)

    def _iter_batches(self, skip_batches: int = 0) -> Iterator[Dict]:
        epoch = 0
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            while True:
                indices = self._epoch_indices(epoch)
                rng = np.random.default_rng(self.seed * 7919 + epoch)
                cursor = 0
                n = len(indices)
                # resume fast-forward: skip whole batches WITHOUT decoding
                # (checkpoint resume, train/loop.py). Exact when no items
                # dropped in the skipped region — dropped (corrupt/short)
                # items consume extra top-up indices the skip can't see,
                # so on dirty corpora the replay realigns within one batch.
                per_epoch = n // self.batch_size
                if skip_batches >= per_epoch:
                    skip_batches -= per_epoch
                    epoch += 1
                    continue
                cursor = skip_batches * self.batch_size
                skip_batches = 0

                def fetch(i):
                    return self.train_dataset.__getitem__(
                        int(i), rng=np.random.default_rng(
                            (self.seed, epoch, int(i))))

                while cursor + self.batch_size <= n:
                    want = indices[cursor:cursor + self.batch_size]
                    cursor += self.batch_size
                    items = [r for r in pool.map(fetch, want)
                             if r is not None]
                    # top up dropped items so batches stay full/static
                    while len(items) < self.batch_size and cursor < n:
                        extra = fetch(indices[cursor])
                        cursor += 1
                        if extra is not None:
                            items.append(extra)
                    if len(items) == self.batch_size:
                        yield collate(items)
                epoch += 1
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    def train_dataloader(self, skip_batches: int = 0) -> Iterator[Dict]:
        """Background-prefetched infinite batch iterator. skip_batches
        fast-forwards past already-trained steps on checkpoint resume."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for batch in self._iter_batches(skip_batches):
                    if stop.is_set():
                        return
                    q.put(batch)
            finally:
                q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        def consumer():
            try:
                while True:
                    batch = q.get()
                    if batch is None:
                        return
                    yield batch
            finally:
                stop.set()

        return consumer()
