"""Host-side batch loader: threaded prefetch feeding the jitted train step.

Replaces the torch DataLoader + DeepSpeed distributed sampler
(train.py:103-111): a pool of worker threads materializes samples
(PIL decode + transforms run in C, releasing the GIL), batches are
assembled in the (grad_accum, micro_batch, ...) layout the train step scans
over, and a small queue keeps batches ready ahead of the device.

In a multi-host pod each process loads only its own shard of every global
batch (shard = process_index-strided sampling), mirroring how the
DeepSpeed sampler splits by rank.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import jax
import numpy as np


class BatchLoader:
    """Infinite loader yielding (images, captions) with shapes
    (ga, micro_b, 3, H, W) / (ga, micro_b, s)."""

    def __init__(
        self,
        dataset,
        batch_size: int,              # global samples per optimizer step
        gradient_accumulation_steps: int = 1,
        seq_len: int = 2048,
        num_workers: int = 8,
        seed: int = 0,
        shuffle: bool = True,
        prefetch: int = 2,
        flat: bool = False,           # yield (B, ...) instead of (ga, micro, ...)
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.ga = gradient_accumulation_steps
        assert batch_size % self.ga == 0, (batch_size, self.ga)
        self.micro = batch_size // self.ga
        self.seq_len = seq_len
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shuffle = shuffle
        self.flat = flat

        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _index_stream(self) -> Iterator[int]:
        rng = np.random.RandomState(self.seed)
        n = len(self.dataset)
        n_proc = jax.process_count()
        pidx = jax.process_index()
        while True:
            order = rng.permutation(n) if self.shuffle else np.arange(n)
            # per-process shard of the global order
            for i in order[pidx::n_proc]:
                yield int(i)

    def _produce(self) -> None:
        idx_stream = self._index_stream()
        with ThreadPoolExecutor(self.num_workers) as pool:
            while not self._stop.is_set():
                idxs = [next(idx_stream) for _ in range(self.batch_size)]
                samples = list(pool.map(self.dataset.__getitem__, idxs))
                images = np.concatenate([s[0] for s in samples], axis=0)
                captions = np.concatenate(
                    [s[1][:, : self.seq_len] for s in samples], axis=0
                )
                if not self.flat:
                    images = images.reshape(self.ga, self.micro, *images.shape[1:])
                    captions = captions.reshape(self.ga, self.micro, -1)
                # retry the put until the consumer drains or we are
                # stopped — a timeout must never discard the built batch
                # (silent data skip under a slow consumer)
                while not self._stop.is_set():
                    try:
                        self._q.put((images, captions), timeout=1)
                        break
                    except queue.Full:
                        continue

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        return self._q.get()

    def close(self) -> None:
        self._stop.set()
