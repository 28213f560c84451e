"""COCO-format front-end: json registration + AP evaluation round trip."""

import json
import os

import numpy as np
import pytest

from uni_encoder_tpu.data.catalog import DatasetCatalog
from uni_encoder_tpu.data.datasets.coco import register_coco_instances
from uni_encoder_tpu.evaluation.coco import COCOInstanceEvaluator, _poly_to_mask


@pytest.fixture()
def coco_fixture(tmp_path):
    img_root = tmp_path / "images"
    img_root.mkdir()
    from PIL import Image

    Image.fromarray(np.zeros((32, 48, 3), np.uint8)).save(img_root / "im0.jpg")
    data = {
        "images": [{"id": 1, "file_name": "im0.jpg", "height": 32, "width": 48}],
        "categories": [{"id": 5, "name": "cat"}, {"id": 9, "name": "dog"}],
        "annotations": [
            {
                "id": 1,
                "image_id": 1,
                "category_id": 5,
                "iscrowd": 0,
                "area": 100,
                "bbox": [4, 4, 10, 10],
                "segmentation": [[4, 4, 14, 4, 14, 14, 4, 14]],
            }
        ],
    }
    jf = tmp_path / "inst.json"
    jf.write_text(json.dumps(data))
    register_coco_instances("test_coco", str(jf), str(img_root))
    return str(jf)


def test_register_and_load(coco_fixture):
    items = DatasetCatalog.get("test_coco")
    assert len(items) == 1
    ann = items[0]["annotations"][0]
    assert ann["category_id"] == 0  # contiguous remap of dataset id 5


def test_ap_with_gt_as_prediction(coco_fixture):
    items = DatasetCatalog.get("test_coco")
    item = items[0]
    gt_mask = _poly_to_mask(item["annotations"][0]["segmentation"], 32, 48)
    ev = COCOInstanceEvaluator("test_coco")
    ev.reset()
    out = {
        "instances": {
            "masks": [gt_mask],
            "labels": np.array([0]),
            "scores": np.array([0.9], np.float32),
        }
    }
    ev.process([item], [out])
    res = ev.evaluate()["segm"]
    assert res["AP"] == pytest.approx(100.0)
