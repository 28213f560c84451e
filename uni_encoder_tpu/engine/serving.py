"""Serving pool: asynchronous batched inference.

Capability spec: reference demo/predictor.py AsyncPredictor (:85-173) — a
round-robin pool of one worker process per GPU with an ordered result queue.
TPU-native equivalent: a single process drives the chip(s); requests are
queued, grouped into fixed-size batches, executed by one jitted batched
forward (sharded over the mesh's data axis when multiple devices exist),
and results are delivered in submission order via futures.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


class AsyncBatchedPredictor:
    """Wraps a batched forward `fn(batch_dict) -> batch_outputs` (jitted,
    fixed batch size). Submissions return futures; a background thread
    groups requests into batches (padding the tail with repeats)."""

    def __init__(self, fn: Callable, batch_size: int, max_wait_s: float = 0.005):
        self.fn = fn
        self.batch_size = batch_size
        self.max_wait_s = max_wait_s
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._stop = False
        self._thread.start()

    def submit(self, item: dict) -> Future:
        fut: Future = Future()
        self._q.put((item, fut))
        return fut

    def __call__(self, item: dict):
        return self.submit(item).result()

    def shutdown(self):
        self._stop = True
        self._q.put(None)
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------
    def _loop(self):
        while not self._stop:
            first = self._q.get()
            if first is None:
                return
            batch = [first]
            try:
                while len(batch) < self.batch_size:
                    batch.append(self._q.get(timeout=self.max_wait_s))
            except queue.Empty:
                pass
            items = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            n = len(items)
            # pad to the fixed batch size by repeating the last item: a
            # static batch shape avoids a fresh XLA compile per tail size;
            # the wasted compute is (batch_size - n)/batch_size of one step
            # on the LAST batch only, far cheaper than a recompile
            while len(items) < self.batch_size:
                items.append(items[-1])
            try:
                stacked = {
                    k: jnp.asarray(np.stack([it[k] for it in items])) for k in items[0]
                }
                out = self.fn(stacked)
                out = jax.tree_util.tree_map(np.asarray, out)
                for i, fut in enumerate(futs[:n]):
                    fut.set_result(jax.tree_util.tree_map(lambda x: x[i], out))
            except Exception as e:  # pragma: no cover
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)
