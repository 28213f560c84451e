"""Training mappers: fixed-shape targets from the synthetic fixture."""

import numpy as np
import pytest

from test_eval_pipeline import fixture_root  # noqa: F401  (fixture)

from uni_encoder_tpu.data.catalog import DatasetCatalog
from uni_encoder_tpu.data.train_mappers import (
    BalancedSampler,
    SegmentationTrainMapper,
)


def test_segmentation_train_mapper(fixture_root):  # noqa: F811
    items = DatasetCatalog.get("cityscapes_fine_panoptic_val")
    mapper = SegmentationTrainMapper(crop_size=(64, 128), min_sizes=[64], max_size=256, max_instances=16)
    out = mapper(items[0])
    assert out["images"].shape == (64, 128, 3) and out["images"].dtype == np.uint8
    assert out["task_tokens"].shape == (77,)
    assert out["labels"].shape == (16,)
    assert out["masks"].shape == (16, 16, 32)
    assert out["valid"].any(), "fixture has >=1 instance"
    # valid slots carry non-empty masks with in-range labels
    for i in np.where(out["valid"])[0]:
        assert 0 <= out["labels"][i] < 19
    assert out["task"] in ("semantic", "instance", "panoptic")


def test_task_sampling_distribution(fixture_root):  # noqa: F811
    items = DatasetCatalog.get("cityscapes_fine_panoptic_val")
    mapper = SegmentationTrainMapper(crop_size=(64, 128), min_sizes=[64], max_size=256, seed=1)
    tasks = [mapper(items[0])["task"] for _ in range(60)]
    # TASK_PROB: ~1/3 semantic, ~1/3 instance, ~1/3 panoptic
    assert {"semantic", "instance", "panoptic"} <= set(tasks)


def test_balanced_sampler_interleaves():
    it = iter(BalancedSampler([1, 2, 3], ["a", "b"]))
    kinds = [next(it)[0] for _ in range(8)]
    assert kinds[::2] == ["segmentation"] * 4
    assert kinds[1::2] == ["sequence"] * 4
