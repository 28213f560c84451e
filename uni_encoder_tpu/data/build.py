"""Test data loader.

Capability spec: reference model/data/build.py (:30-121) — dataset dicts
without empty-annotation filtering, an InferenceSampler that splits the
eval set across ranks into contiguous shards, batch size 1, trivial
collation. Here the "rank" is the JAX process index (multi-host eval
sharding), and loading overlaps compute via a bounded thread prefetcher
(the torch DataLoader worker-pool equivalent; a C++ decode path can slot in
behind the same interface).
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Callable, Iterator, List, Optional

from .catalog import DatasetCatalog


def inference_shard(n: int, rank: int, world: int) -> range:
    """Contiguous per-rank shard (d2 InferenceSampler semantics)."""
    shard = -(-n // world)
    begin = min(shard * rank, n)
    end = min(begin + shard, n)
    return range(begin, end)


def build_test_loader(
    dataset_name: str,
    mapper: Callable,
    rank: int = 0,
    world: int = 1,
    prefetch: int = 4,
) -> "PrefetchLoader":
    dicts = DatasetCatalog.get(dataset_name)
    idx = inference_shard(len(dicts), rank, world)
    items = [dicts[i] for i in idx]
    return PrefetchLoader(items, mapper, prefetch)


class PrefetchLoader:
    def __init__(self, items: List[dict], mapper: Callable, prefetch: int = 4):
        self.items = items
        self.mapper = mapper
        self.prefetch = prefetch

    def __len__(self):
        return len(self.items)

    def __iter__(self) -> Iterator[dict]:
        if not self.items:
            return
        with cf.ThreadPoolExecutor(max_workers=min(4, self.prefetch)) as pool:
            pending = []
            it = iter(self.items)
            for _ in range(self.prefetch):
                try:
                    pending.append(pool.submit(self.mapper, next(it)))
                except StopIteration:
                    break
            while pending:
                fut = pending.pop(0)
                try:
                    pending.append(pool.submit(self.mapper, next(it)))
                except StopIteration:
                    pass
                yield fut.result()
