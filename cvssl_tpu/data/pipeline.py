"""Host -> device input pipeline.

Replaces the reference's torch DataLoader(num_workers=16, pin_memory)
(``train_fully_supervised_2D.py:84-85``) with sequential sample loading in
a background prefetch thread + collate to channels-last numpy batches —
the prefetch overlaps host augmentation with device compute, which is the
part that keeps the TPU fed.

Samples within a batch are loaded SEQUENTIALLY, on purpose: dataset
transforms hold one stateful ``np.random.Generator``, and a thread-pool
loader (the original design) let worker interleaving shuffle which sample
consumed which draws — measurably nondeterministic batches run-to-run
(hash test in tests/test_data.py::test_pipeline_deterministic), which
broke trajectory reproducibility (the mean-teacher fit-parity flake).
Determinism is a design invariant here (CLAUDE.md); the reference's torch
loader has the same per-worker-seed subtlety, handled there by
``worker_init_fn`` (``train_fully_supervised_2D.py:87-89``).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

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
    """Iterate batches from (dataset, batch_sampler); ``stream()`` adds
    background prefetch. ``num_workers`` is kept for API compatibility but
    loading is sequential (see module docstring: determinism)."""

    def __init__(self, dataset, batch_sampler, num_workers: int = 8,
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)  # unused; see docstring
        self.prefetch = prefetch

    def _load_batch(self, indices) -> dict:
        return collate([self.dataset[i] for i in indices])

    def __iter__(self) -> Iterator[dict]:
        """One epoch of batches (no prefetch; use ``stream`` for training)."""
        for indices in self.batch_sampler:
            yield self._load_batch(indices)

    def stream(self) -> Iterator[dict]:
        """Infinite prefetched batch stream over sampler epochs."""
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
