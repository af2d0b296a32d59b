"""Host-side data loading.

Reference: /root/reference/src/dataloader.py — batch_size=1 DataLoader over
bucket datasets (each item already a full batch) with concat-collate, plus
a flatten-collate preview loader. TPU-native version: a plain Python
iterator (no torch workers); numpy arrays concatenate across the
(batch-of-batches) dim; per-epoch shuffling with an explicit seed so every
host permutes identically and then strides by process for DP sharding.
"""

from __future__ import annotations

import random
from collections import defaultdict
from typing import Any, Callable, Iterable, Iterator, Optional

import numpy as np


def concatnate_collate_fn(batch: Iterable[dict[str, Any]]) -> dict:
    """Concatenate values across items (reference dataloader.py:68-88;
    typo'd name preserved for API parity)."""
    result = defaultdict(list)
    for d in batch:
        for key, value in d.items():
            result[key].append(value)
    new_batch = {}
    for key, value in result.items():
        if isinstance(value[0], np.ndarray):
            new_batch[key] = np.concatenate(value, axis=0)
        elif isinstance(value[0], list):
            new_batch[key] = sum(value, [])
        else:
            new_batch[key] = value
    return new_batch


def preview_batch_collate_fn(batch: Iterable[dict[str, Any]]) -> dict:
    result = defaultdict(list)
    for d in batch:
        for key, value in d.items():
            result[key].append(value)
    new_batch = {}
    for key, value in result.items():
        assert len(value) == 1, "Preview batch size must be 1"
        new_batch[key] = value[0]
    return new_batch


class DataLoader:
    """Minimal epoch iterator over an indexable dataset.

    ``shard(process_index, process_count)`` makes each host read only its
    stride of batch indices — the jax analogue of Accelerate's
    prepare_data_loader rank sharding (reference trainer/common.py:121).
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = True,
        drop_last: bool = False,
        collate_fn: Optional[Callable] = None,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        num_workers: int = 0,
        prefetch_factor: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or (lambda items: items)
        self.seed = seed
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count
        # threaded prefetch (the jax-host analogue of torch DataLoader
        # workers): PIL/zlib decode releases the GIL, so a small thread
        # pool overlaps image decode with device compute
        self.num_workers = num_workers
        self.prefetch_factor = max(prefetch_factor, 1)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> list[int]:
        indices = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(indices)
        return indices[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n = len(self.dataset)
        per_proc = (n - self.process_index + self.process_count - 1) // self.process_count
        if self.drop_last:
            return per_proc // self.batch_size
        return (per_proc + self.batch_size - 1) // self.batch_size

    def _chunks(self) -> list[list[int]]:
        indices = self._indices()
        chunks = []
        for start in range(0, len(indices), self.batch_size):
            chunk = indices[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            chunks.append(chunk)
        return chunks

    def __iter__(self) -> Iterator[dict]:
        chunks = self._chunks()
        if self.num_workers <= 0:
            for chunk in chunks:
                yield self.collate_fn([self.dataset[i] for i in chunk])
            return

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            window: deque = deque()
            it = iter(chunks)
            depth = self.prefetch_factor + 1
            for chunk in chunks[:depth]:
                next(it)
                window.append([pool.submit(self.dataset.__getitem__, i) for i in chunk])
            while window:
                futures = window.popleft()
                upcoming = next(it, None)
                if upcoming is not None:
                    window.append(
                        [pool.submit(self.dataset.__getitem__, i) for i in upcoming]
                    )
                yield self.collate_fn([f.result() for f in futures])


def get_dataloader(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    num_workers: int = 0,
    drop_last: bool = False,
    seed: int = 0,
    collate_fn: Optional[Callable] = None,
    process_index: int = 0,
    process_count: int = 1,
) -> DataLoader:
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        collate_fn=collate_fn,
        seed=seed,
        process_index=process_index,
        process_count=process_count,
        num_workers=num_workers,
    )


def get_dataloader_for_bucketing(
    dataset,
    shuffle: bool = True,
    num_workers: int = 0,
    drop_last: bool = False,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
) -> DataLoader:
    """batch_size=1 + concat collate: each dataset item IS a bucket batch."""
    return DataLoader(
        dataset,
        batch_size=1,
        shuffle=shuffle,
        drop_last=drop_last,
        collate_fn=concatnate_collate_fn,
        seed=seed,
        process_index=process_index,
        process_count=process_count,
        num_workers=num_workers,
    )


def get_dataloader_for_preview(dataset, num_workers: int = 0) -> DataLoader:
    return DataLoader(
        dataset,
        batch_size=1,
        shuffle=False,
        collate_fn=preview_batch_collate_fn,
    )
