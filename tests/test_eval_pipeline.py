"""Synthetic mini-Cityscapes fixture: registration -> loader/mapper ->
evaluators, with GT fed back as prediction (=> perfect scores). Exercises
the full eval data path without the real dataset (SURVEY.md §4c)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from uni_encoder_tpu.data.build import build_test_loader
from uni_encoder_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from uni_encoder_tpu.data.cityscapes_labels import TRAINID_TO_ID
from uni_encoder_tpu.data.mappers import TestMapper


H, W = 64, 128


def _make_fixture(root):
    """Two fake val images with panoptic/semantic/instance GT."""
    img_dir = os.path.join(root, "cityscapes/leftImg8bit/val/fakecity")
    gt_dir = os.path.join(root, "cityscapes/gtFine/cityscapes_panoptic_val")
    fine_dir = os.path.join(root, "cityscapes/gtFine/val/fakecity")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(fine_dir, exist_ok=True)

    anns = []
    rng = np.random.RandomState(0)
    for i in range(2):
        stem = f"fakecity_{i:06d}_000019"
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, stem + "_leftImg8bit.png"))

        # layout: left half road (train 0, stuff), right half car instance
        # (train 13, thing), bottom strip sky (train 10, stuff)
        sem = np.zeros((H, W), np.uint8)
        sem[:, W // 2 :] = 13
        sem[-8:, :] = 10

        pan_id = np.zeros((H, W), np.int64)
        pan_id[:, : W // 2] = 7  # road: stuff encoded as dataset id
        pan_id[:, W // 2 :] = 26 * 1000 + 1  # one car instance
        pan_id[-8:, :] = 23  # sky
        segments = [
            {"id": 7, "category_id": 7, "iscrowd": 0},
            {"id": 26 * 1000 + 1, "category_id": 26, "iscrowd": 0},
            {"id": 23, "category_id": 23, "iscrowd": 0},
        ]
        pan_png = np.stack(
            [pan_id % 256, (pan_id // 256) % 256, pan_id // 256 ** 2], axis=-1
        ).astype(np.uint8)
        Image.fromarray(pan_png).save(os.path.join(gt_dir, stem + "_gtFine_panoptic.png"))
        Image.fromarray(sem).save(os.path.join(fine_dir, stem + "_gtFine_labelTrainIds.png"))

        inst = np.zeros((H, W), np.int32)
        inst[:, : W // 2] = 7
        inst[:, W // 2 :] = 26 * 1000 + 1
        inst[-8:, :] = 23
        Image.fromarray(inst, mode="I").save(
            os.path.join(fine_dir, stem + "_gtFine_instanceIds.png")
        )
        anns.append(
            {
                "image_id": stem,
                "file_name": stem + "_gtFine_panoptic.png",
                "segments_info": segments,
            }
        )
    with open(os.path.join(root, "cityscapes/gtFine/cityscapes_panoptic_val.json"), "w") as f:
        json.dump({"annotations": anns}, f)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_cityscapes"))
    _make_fixture(root)
    from uni_encoder_tpu.data.datasets import cityscapes_panoptic

    cityscapes_panoptic.register_all(root)
    return root


def _gt_as_prediction(item):
    """Build a model-output dict straight from the GT files."""
    from uni_encoder_tpu.data.cityscapes_labels import ID_TO_TRAINID

    pan_png = np.asarray(Image.open(item["pan_seg_file_name"]), np.uint32)
    gt_ids = pan_png[..., 0] + 256 * pan_png[..., 1] + 256 ** 2 * pan_png[..., 2]
    seg = np.zeros_like(gt_ids, np.int32)
    infos = []
    masks, labels = [], []
    for new_id, s in enumerate(item["segments_info"], start=1):
        # registration converted category_id to contiguous trainIds already
        m = gt_ids == _orig_id(s, item)
        seg[m] = new_id
        infos.append({"id": new_id, "category_id": s["category_id"], "isthing": s["category_id"] >= 11})
        if s["category_id"] >= 11:
            masks.append(m)
            labels.append(s["category_id"])
    sem = np.asarray(Image.open(item["sem_seg_file_name"]))
    out = {
        "sem_seg": np.eye(19, dtype=np.float32)[np.clip(sem, 0, 18)].transpose(2, 0, 1),
        "panoptic_seg": (seg, infos),
        "instances": {
            "masks": np.stack(masks) if masks else np.zeros((0, *seg.shape), bool),
            "labels": np.asarray(labels, np.int64),
            "scores": np.ones(len(labels), np.float32),
        },
    }
    return out


def _orig_id(segment, item):
    # recover the original panoptic id for this segment from the GT png
    return segment["id"]


def test_eval_pipeline_perfect_scores(fixture_root):
    from uni_encoder_tpu.evaluation.cityscapes import (
        CityscapesInstanceEvaluator,
        CityscapesPanopticEvaluator,
        CityscapesSemSegEvaluator,
    )

    name = "cityscapes_fine_panoptic_val"
    mapper = TestMapper(task="panoptic", seg_min_size=H, seg_max_size=W)
    loader = build_test_loader(name, mapper)
    assert len(loader) == 2

    ev_sem = CityscapesSemSegEvaluator(name)
    ev_pan = CityscapesPanopticEvaluator(name)
    ev_inst = CityscapesInstanceEvaluator(name)
    for e in (ev_sem, ev_pan, ev_inst):
        e.reset()
    for item in loader:
        out = _gt_as_prediction(item)
        ev_sem.process([item], [out])
        ev_pan.process([item], [out])
        ev_inst.process([item], [out])

    assert ev_sem.evaluate()["sem_seg"]["mIoU"] == pytest.approx(100.0)
    pq = ev_pan.evaluate()["panoptic_seg"]
    assert pq["PQ"] == pytest.approx(100.0), pq
    ap = ev_inst.evaluate()["segm"]
    assert ap["AP"] == pytest.approx(100.0), ap


def test_loader_shards():
    from uni_encoder_tpu.data.build import inference_shard

    assert list(inference_shard(10, 0, 4)) == [0, 1, 2]
    assert list(inference_shard(10, 3, 4)) == [9]
    total = sum(len(inference_shard(10, r, 4)) for r in range(4))
    assert total == 10


# ----------------------------------------------------------------- ADE20K


@pytest.fixture(scope="module")
def ade_fixture_root(tmp_path_factory):
    """Synthetic raw ADE20K tree -> the three prepare scripts -> registration."""
    import importlib.util

    from uni_encoder_tpu.data.prep import ade20k_instance_to_semantic

    root = tmp_path_factory.mktemp("mini_ade")
    base = os.path.join(str(root), "ADEChallengeData2016")
    ins_to_sem = ade20k_instance_to_semantic()
    sem_of_thing = ins_to_sem[3]
    thing_sems = set(ins_to_sem.values())
    stuff_sem = next(s for s in range(1, 151) if s not in thing_sems)

    for split in ("training", "validation"):
        for sub in ("images", "annotations", "annotations_instance"):
            os.makedirs(os.path.join(base, sub, split), exist_ok=True)
        for k in range(2):
            name = f"ADE_{split[:5]}_{k:08d}"
            h, w = 32, 48
            Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
                os.path.join(base, "images", split, name + ".jpg")
            )
            sem = np.full((h, w), stuff_sem, np.uint8)
            sem[10:20, 8:24] = sem_of_thing
            Image.fromarray(sem).save(os.path.join(base, "annotations", split, name + ".png"))
            inst = np.zeros((h, w, 3), np.uint8)
            inst[10:20, 8:24, 0] = 3
            inst[10:15, 8:24, 1] = 1
            inst[15:20, 8:24, 1] = 2
            Image.fromarray(inst).save(
                os.path.join(base, "annotations_instance", split, name + ".png")
            )

    repo = os.path.join(os.path.dirname(__file__), "..")
    for script in ("prepare_ade20k_sem_seg", "prepare_ade20k_pan_seg", "prepare_ade20k_ins_seg"):
        spec = importlib.util.spec_from_file_location(
            script, os.path.join(repo, "datasets", script + ".py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main(str(root))

    from uni_encoder_tpu.data.datasets import ade20k

    ade20k.register_all(str(root))
    return str(root)


def _ade_gt_as_prediction(item):
    from uni_encoder_tpu.data.prep import rgb2id
    from uni_encoder_tpu.evaluation.coco import _rle_to_mask

    pan_png = np.asarray(Image.open(item["pan_seg_file_name"]), np.uint8)
    gt_ids = rgb2id(pan_png)
    thing_ids = set()  # contiguous 150-ids that are things, from metadata
    meta = MetadataCatalog.get("ade20k_panoptic_val")
    thing_ids = set(meta.thing_dataset_id_to_contiguous_id.values())

    seg = np.zeros_like(gt_ids, np.int32)
    infos = []
    for new_id, s in enumerate(item["segments_info"], start=1):
        seg[gt_ids == s["id"]] = new_id
        infos.append(
            {"id": new_id, "category_id": s["category_id"], "isthing": s["category_id"] in thing_ids}
        )

    sem = np.asarray(Image.open(item["sem_seg_file_name"]))
    h, w = sem.shape
    masks, labels = [], []
    for a in item["annotations"]:
        masks.append(_rle_to_mask(dict(a["segmentation"], order="F"), h, w))
        labels.append(a["category_id"])  # already contiguous 0..99 (post-quirk space)
    return {
        "sem_seg": np.eye(150, dtype=np.float32)[np.where(sem == 255, 0, sem)].transpose(2, 0, 1)
        * (sem != 255)[None],
        "panoptic_seg": (seg, infos),
        "instances": {
            "masks": np.stack(masks),
            "labels": np.asarray(labels, np.int64),
            "scores": np.ones(len(labels), np.float32),
        },
    }


def test_ade20k_eval_pipeline_perfect_scores(ade_fixture_root):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from evaluate import build_evaluator

    name = "ade20k_panoptic_val"
    mapper = TestMapper(task="panoptic", seg_min_size=32, seg_max_size=64)
    loader = build_test_loader(name, mapper)
    assert len(loader) == 2

    ev = build_evaluator(name, "panoptic")  # routes PQ + mIoU (AP needs task=instance)
    ev.reset()
    for item in loader:
        ev.process([item], [_ade_gt_as_prediction(item)])
    res = ev.evaluate()
    assert res["panoptic_seg"]["PQ"] == pytest.approx(100.0), res
    assert res["sem_seg"]["mIoU"] == pytest.approx(100.0), res
    assert "segm" not in res  # panoptic-token AP is not reference-comparable

    # instance AP comes from a task=instance run (reference gates its label
    # remap on 'instance' in task_type — ADVICE r3)
    ev_i = build_evaluator(name, "instance")
    ev_i.reset()
    for item in loader:
        ev_i.process([item], [_ade_gt_as_prediction(item)])
    res_i = ev_i.evaluate()
    assert res_i["segm"]["AP"] == pytest.approx(100.0), res_i
