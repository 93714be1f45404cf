"""Threaded prefetching batch loader.

The reference relies on torch DataLoader worker processes
(`libs/config.py:20-21`, num_workers=4 + pin_memory); here a thread pool
decodes/transforms (cv2 releases the GIL in its C++ kernels) and an output
queue keeps batches ready while the TPU computes.  Batches are channel-last
numpy dicts ready for `jax.device_put`.

Static-shape discipline: training batches drop the remainder; eval batches
are zero-padded to the fixed batch size and carry `n_valid` so every jit
program compiles exactly once.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


class TwoViewSamples:
    """A list of (path1, path2, label) samples + a decode/transform fn."""

    def __init__(self, samples: Sequence[Tuple], load_fn: Callable,
                 transform=None):
        self.samples = list(samples)
        self.load_fn = load_fn
        self.transform = transform

    def __len__(self):
        return len(self.samples)

    def get(self, idx: int, rng: Optional[np.random.Generator] = None):
        img1, img2, label = self.load_fn(self.samples[idx])
        if self.transform is not None:
            img1 = self.transform(img1, rng)
            img2 = self.transform(img2, rng)
        return img1, img2, label


class TwoViewLoader:
    """Iterable over batches {'image1', 'image2', 'label', 'n_valid'}."""

    def __init__(self, dataset: TwoViewSamples, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 num_workers: int = 4, seed: int = 0,
                 pad_to_batch: bool = True, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.pad_to_batch = pad_to_batch
        self.prefetch = prefetch
        self._epoch = 0
        # multi-host data sharding (`parallel.distributed`): when set (a
        # `slice`), every process builds the same global batch order (same
        # seed) and this process decodes only its slice of each batch.
        # Use with drop_last=True so every local shard is full-size.
        self.process_slice: Optional[slice] = None

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        batches = []
        for s in range(0, n, self.batch_size):
            b = idx[s:s + self.batch_size]
            if self.drop_last and len(b) < self.batch_size:
                break
            batches.append(b)
        if self.process_slice is not None:
            batches = [b[self.process_slice] for b in batches]
        return batches

    def _target_batch_size(self) -> int:
        if self.process_slice is None:
            return self.batch_size
        return len(range(*self.process_slice.indices(self.batch_size)))

    def _make_batch(self, b: np.ndarray, base_seed: int) -> Dict:
        n_valid = len(b)
        outs1, outs2, labels = [], [], []
        for j, i in enumerate(b):
            rng = np.random.default_rng(base_seed * 100003 + int(i))
            i1, i2, lab = self.dataset.get(int(i), rng)
            outs1.append(i1)
            outs2.append(i2)
            labels.append(lab)
        img1 = np.stack(outs1)
        img2 = np.stack(outs2)
        label = np.asarray(labels)
        target = self._target_batch_size()
        if self.pad_to_batch and n_valid < target:
            pad = target - n_valid
            img1 = np.concatenate(
                [img1, np.zeros((pad,) + img1.shape[1:], img1.dtype)])
            img2 = np.concatenate(
                [img2, np.zeros((pad,) + img2.shape[1:], img2.dtype)])
            label = np.concatenate(
                [label, np.zeros((pad,) + label.shape[1:], label.dtype)])
        return {"image1": img1, "image2": img2, "label": label,
                "n_valid": n_valid}

    def __iter__(self) -> Iterator[Dict]:
        self._epoch += 1
        batches = self._index_batches()
        base_seed = self.seed + 1_000_003 * self._epoch
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [pool.submit(self._make_batch, b, base_seed + k)
                           for k, b in enumerate(batches)]
                for f in futures:
                    if stop.is_set():
                        f.cancel()
                        continue
                    try:
                        q.put(f.result())
                    except Exception as e:  # surface worker errors
                        q.put(e)
                        return
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
