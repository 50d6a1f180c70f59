"""Host -> device input pipeline.

Replaces the reference's torch DataLoader(num_workers=16, pin_memory)
(``train_fully_supervised_2D.py:84-85``) with a thread-pool loader + collate
to channels-last numpy batches + background prefetch, keeping the TPU fed
while augmentation runs on host CPU.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

_IMAGE_KEYS = ("image", "image_weak", "image_strong")


def collate(samples: list[dict]) -> dict:
    """Stack sample dicts into a batch dict. Image-like keys gain a trailing
    channel axis (NHWC / NDHWC); labels become int32."""
    batch = {}
    for key in samples[0]:
        if key == "case":
            continue
        vals = [s[key] for s in samples]
        if key in _IMAGE_KEYS:
            arr = np.stack(vals).astype(np.float32)
            batch[key] = arr[..., None]
        elif key == "onehot_label":
            batch[key] = np.stack(vals).astype(np.float32)
        elif key == "idx":
            batch[key] = np.asarray(vals, np.int32)
        else:
            batch[key] = np.stack(vals).astype(np.int32)
    return batch


class DataPipeline:
    """Iterate batches from (dataset, batch_sampler) with parallel sample
    loading and background prefetch."""

    def __init__(self, dataset, batch_sampler, num_workers: int = 8,
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._pool: Optional[ThreadPoolExecutor] = None

    def _load_batch(self, indices) -> dict:
        if self._pool is None:
            samples = [self.dataset[i] for i in indices]
        else:
            samples = list(self._pool.map(self.dataset.__getitem__, indices))
        return collate(samples)

    def __iter__(self) -> Iterator[dict]:
        """One epoch of batches (no prefetch; use ``stream`` for training)."""
        self._pool = self._pool or ThreadPoolExecutor(self.num_workers)
        for indices in self.batch_sampler:
            yield self._load_batch(indices)

    def stream(self) -> Iterator[dict]:
        """Infinite prefetched batch stream over sampler epochs."""
        self._pool = self._pool or ThreadPoolExecutor(self.num_workers)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for indices in self.batch_sampler.epochs():
                if stop.is_set():
                    return
                q.put(self._load_batch(indices))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
            # Drain so the producer's blocked put() can observe stop.
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
