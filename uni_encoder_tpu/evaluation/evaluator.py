"""Evaluator protocol + inference loop.

Capability spec: reference model/evaluation/evaluator.py (:19-228) —
DatasetEvaluator with reset/process/evaluate, DatasetEvaluators fan-out, and
an inference loop with periodic ETA logging. Distribution note: the
reference gathers per-rank state via torch.distributed; here multi-host eval
shards the dataset per process (data/build.py) and evaluators merge state on
host 0 via jax.experimental.multihost_utils when world > 1.
"""

from __future__ import annotations

import datetime
import logging
import time
from typing import Callable, Dict, List, Optional

logger = logging.getLogger(__name__)


class DatasetEvaluator:
    def reset(self):
        pass

    def process(self, inputs: List[dict], outputs: List[dict]):
        pass

    def evaluate(self) -> Optional[Dict]:
        pass


class DatasetEvaluators(DatasetEvaluator):
    def __init__(self, evaluators: List[DatasetEvaluator]):
        self._evaluators = evaluators

    def reset(self):
        for e in self._evaluators:
            e.reset()

    def process(self, inputs, outputs):
        for e in self._evaluators:
            e.process(inputs, outputs)

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
    results = evaluator.evaluate()
    total_t = time.perf_counter() - start
    logger.info(f"inference done: {total} images in {total_t:.1f}s ({total / max(total_t,1e-9):.2f} img/s)")
    return results or {}
