"""Evaluator protocol + inference loop.

Capability spec: reference model/evaluation/evaluator.py (:19-228) —
DatasetEvaluator with reset/process/evaluate, DatasetEvaluators fan-out, and
an inference loop with periodic ETA logging. Distribution: the reference
gathers per-rank state via torch.distributed (comm.gather/synchronize);
here multi-host eval shards the dataset per process (data/build.py
inference_shard) and `inference_on_dataset` allgathers each evaluator's
accumulated state across hosts (pickle -> padded uint8 arrays ->
multihost_utils.process_allgather) before summarizing, so every host
reports dataset-level metrics.
"""

from __future__ import annotations

import datetime
import logging
import pickle
import time
from typing import Any, Callable, Dict, List, Optional

logger = logging.getLogger(__name__)


def _pack_object(obj: Any):
    """pickle -> uint8 numpy array (transport encoding)."""
    import numpy as np

    return np.frombuffer(pickle.dumps(obj), np.uint8)


def _pad_to(data, size: int):
    import numpy as np

    padded = np.zeros((size,), np.uint8)
    padded[: data.size] = data
    return padded


def _unpack_gathered(sizes, gathered) -> List[Any]:
    """Inverse of the pad/stack transport: gathered (P, max_size) uint8 rows
    + per-row true sizes -> per-process objects."""
    import numpy as np

    sizes = np.asarray(sizes).reshape(-1)
    gathered = np.asarray(gathered)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(len(sizes))
    ]


def allgather_object(obj: Any, _allgather: Optional[Callable] = None) -> List[Any]:
    """Allgather an arbitrary picklable object across JAX processes.
    Returns the per-process list (length jax.process_count(), this process's
    contribution at index jax.process_index()).

    `_allgather` injects the collective for testing: it must map a local
    numpy array to the (P, ...) stack of all processes' arrays (default:
    jax.experimental.multihost_utils.process_allgather).
    """
    import jax

    if _allgather is None:
        if jax.process_count() == 1:
            return [obj]
        from jax.experimental import multihost_utils

        _allgather = multihost_utils.process_allgather
    import numpy as np

    data = _pack_object(obj)
    sizes = np.asarray(_allgather(np.asarray([data.size], np.int64))).reshape(-1)
    gathered = _allgather(_pad_to(data, int(sizes.max())))
    return _unpack_gathered(sizes, gathered)


class DatasetEvaluator:
    def reset(self):
        pass

    def process(self, inputs: List[dict], outputs: List[dict]):
        pass

    def evaluate(self) -> Optional[Dict]:
        pass

    # -------------------------------------------------- multi-host merging
    def state(self) -> Any:
        """Picklable accumulated state (overridden by concrete evaluators)."""
        raise NotImplementedError(type(self).__name__)

    def merge_state(self, states: List[Any]) -> None:
        """Replace this evaluator's state with the union of all shards'
        states (self's own included)."""
        raise NotImplementedError(type(self).__name__)

    def merge_across_processes(self) -> None:
        import jax

        if jax.process_count() <= 1:
            return
        self.merge_state(allgather_object(self.state()))


class DatasetEvaluators(DatasetEvaluator):
    def __init__(self, evaluators: List[DatasetEvaluator]):
        self._evaluators = evaluators

    def reset(self):
        for e in self._evaluators:
            e.reset()

    def process(self, inputs, outputs):
        for e in self._evaluators:
            e.process(inputs, outputs)

    def state(self):
        return [e.state() for e in self._evaluators]

    def merge_state(self, states):
        for i, e in enumerate(self._evaluators):
            e.merge_state([s[i] for s in states])

    def evaluate(self):
        results: Dict = {}
        for e in self._evaluators:
            r = e.evaluate()
            if r:
                for k, v in r.items():
                    assert k not in results, f"duplicate metric key {k}"
                    results[k] = v
        return results


def inference_on_dataset(run_model: Callable, data_loader, evaluator: DatasetEvaluator) -> Dict:
    """run_model(item) -> output dict; batch size 1 like the reference's
    eval loop (build.py:113)."""
    evaluator.reset()
    total = len(data_loader)
    start = time.perf_counter()
    last_log = start
    for i, item in enumerate(data_loader):
        out = run_model(item)
        evaluator.process([item], [out])
        now = time.perf_counter()
        if now - last_log > 5.0:
            per_img = (now - start) / (i + 1)
            eta = datetime.timedelta(seconds=int(per_img * (total - i - 1)))
            logger.info(f"inference {i+1}/{total} ({per_img:.3f} s/img, ETA {eta})")
            last_log = now
    # dataset was sharded per process (data/build.py); merge shard states so
    # metrics are dataset-level (reference: comm.gather in evaluate())
    evaluator.merge_across_processes()
    results = evaluator.evaluate()
    total_t = time.perf_counter() - start
    logger.info(f"inference done: {total} images in {total_t:.1f}s ({total / max(total_t,1e-9):.2f} img/s)")
    return results or {}
