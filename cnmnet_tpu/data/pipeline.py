"""Host-side input pipeline: collation, normalization, threaded prefetch.

The reference leans on torch DataLoader workers (`train.py:51-54`); here the
host pipeline is a thin thread-pool prefetcher feeding numpy batches to the
device loop (double-buffered so H2D transfer and host decode overlap the TPU
step), with the C++ native decoder supplying in-process parallel decode
underneath. This is the ONE loader surface: a grain-based alternative was
removed in round 3 (two shuffle/shard implementations to keep in sync, no
caller) — if checkpointable input iterators are ever needed, reintroduce
grain as the backend *inside* PrefetchLoader rather than beside it.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Sequence

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_images(images: np.ndarray) -> np.ndarray:
    """ImageNet zero-mean/unit-var on [0, 1] RGB (`scannet/preprocess.py:16-26`)."""
    return ((images - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def quantize_images_u8(images: np.ndarray) -> np.ndarray:
    """[0, 1] float RGB -> the uint8 wire format (4x smaller H2D transfers);
    the inverse affine runs in-graph (`ops/images.prepare_images`)."""
    return np.clip(np.rint(images * 255.0), 0, 255).astype(np.uint8)


def denormalize_images(images: np.ndarray) -> np.ndarray:
    """Back to [0, 1] RGB for visualization, from either wire format."""
    if images.dtype == np.uint8:
        return images.astype(np.float32) / 255.0
    return images * IMAGENET_STD + IMAGENET_MEAN


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into one batch dict."""
    keys = samples[0].keys()
    return {k: np.stack([np.asarray(s[k]) for s in samples]) for k in keys}


class PrefetchLoader:
    """Threaded map-style loader: indexes -> samples -> collated batches.

    dataset: any object with __len__ and __getitem__ -> dict of ndarrays.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        transform: Callable[[Dict], Dict] | None = None,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        """``shard_index``/``shard_count`` partition the index stream
        disjointly across hosts (multi-host data parallelism): every host
        shuffles the full epoch with the same seed, keeps the strided slice
        ``order[shard_index::shard_count]``, then truncates to the COMMON
        shard length ``len(dataset) // shard_count`` so every host yields
        the same number of batches per epoch — a host with one extra batch
        would dispatch a collective train step its peers never join and
        hang at the rendezvous. ``batch_size`` is the HOST-LOCAL batch; the
        global batch is ``batch_size * shard_count``.
        """
        assert 0 <= shard_index < shard_count, (shard_index, shard_count)
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.transform = transform
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._epoch = 0

    def _shard_len(self):
        return len(self.dataset) // self.shard_count

    def __len__(self):
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[List[int]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        if self.shard_count > 1:
            order = order[self.shard_index :: self.shard_count]
            order = order[: self._shard_len()]
        n = len(order)
        batches = []
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                break
            batches.append(list(idx))
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._epoch += 1
        batches = self._index_batches()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, idx))
                        batch = collate(samples)
                        if self.transform is not None:
                            batch = self.transform(batch)
                        out_q.put(batch)
            except Exception as e:  # surface worker errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
