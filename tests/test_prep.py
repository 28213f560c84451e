"""Dataset-prep tooling tests: RLE codec round-trips, panoptic id codec,
IdGenerator, and the ADE20K prepare scripts end-to-end on a synthetic tree
(reference datasets/prepare_ade20k_{sem,ins,pan}_seg.py,
panoptic2detection_coco_format.py behavior contracts)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from uni_encoder_tpu.data.prep import (
    IdGenerator,
    ade20k_150_categories,
    ade20k_instance_to_semantic,
    encode_rle,
    id2rgb,
    mask_bbox_xywh,
    mask_to_rle_counts,
    rgb2id,
    rle_area,
)
from uni_encoder_tpu.evaluation.coco import _rle_to_mask

REPO = os.path.join(os.path.dirname(__file__), "..")


def _load_script(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REPO, "datasets", name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ----------------------------------------------------------------- codecs


def test_rle_roundtrip_random():
    rng = np.random.RandomState(0)
    for _ in range(25):
        h, w = rng.randint(1, 40, size=2)
        mask = rng.rand(h, w) > rng.rand()
        rle = encode_rle(mask)
        back = _rle_to_mask(dict(rle, order="F"), h, w)
        np.testing.assert_array_equal(back, mask)
        assert rle_area(rle) == int(mask.sum())


def test_rle_counts_column_major_with_leading_zero_run():
    mask = np.zeros((3, 2), bool)
    mask[0, 0] = True  # first pixel set -> leading zero run of length 0
    assert mask_to_rle_counts(mask) == [0, 1, 5]
    mask2 = np.zeros((2, 2), bool)
    mask2[1, 1] = True  # column-major position 3
    assert mask_to_rle_counts(mask2) == [3, 1]


def test_rle_delta_coding_handles_negative_deltas():
    # alternating long/short runs force negative counts[i]-counts[i-2] deltas
    mask = np.zeros((1, 64), bool)
    mask[0, 5:50] = True
    mask[0, 51:53] = True
    rle = encode_rle(mask)
    np.testing.assert_array_equal(_rle_to_mask(dict(rle, order="F"), 1, 64), mask)


def test_rgb2id_id2rgb_roundtrip():
    ids = np.array([[0, 1, 255], [256, 70000, 16777215]], np.int64)
    assert rgb2id(id2rgb(ids)).tolist() == ids.tolist()


def test_id_generator_unique_and_base_first():
    cats = {0: {"color": [10, 20, 30]}, 1: {"color": [10, 20, 30]}}
    gen = IdGenerator(cats)
    id0, c0 = gen.get_id_and_color(0)
    assert c0 == (10, 20, 30) and id0 == 10 + 20 * 256 + 30 * 65536
    seen = {id0}
    for _ in range(20):
        sid, color = gen.get_id_and_color(1)
        assert sid not in seen and color != (0, 0, 0)
        seen.add(sid)


def test_id_generator_never_emits_void_color():
    gen = IdGenerator({0: {"color": [0, 0, 0]}})
    sid, color = gen.get_id_and_color(0)
    assert color != (0, 0, 0) and sid != 0


def test_ade20k_meta_tables():
    cats = ade20k_150_categories()
    assert len(cats) == 150
    assert sum(c["isthing"] for c in cats) == 100
    m = ade20k_instance_to_semantic()
    assert len(m) == 100 and all(1 <= v <= 150 for v in m.values())


# ------------------------------------------------- synthetic ADE20K tree


@pytest.fixture(scope="module")
def ade_root(tmp_path_factory):
    """Two tiny images with semantic + instance annotation PNGs in the raw
    ADE20K layout, then all three prepare scripts run over them."""
    root = tmp_path_factory.mktemp("ade")
    base = root / "ADEChallengeData2016"
    ins_to_sem = ade20k_instance_to_semantic()  # 1-based -> 1-based
    ins_cat = 1  # instance category 1 -> semantic ins_to_sem[1]
    sem_of_thing = ins_to_sem[ins_cat]
    # a stuff semantic class: any 1-based id not in the thing set
    thing_sems = set(ins_to_sem.values())
    stuff_sem = next(s for s in range(1, 151) if s not in thing_sems)

    for split in ("training", "validation"):
        (base / "images" / split).mkdir(parents=True)
        (base / "annotations" / split).mkdir(parents=True)
        (base / "annotations_instance" / split).mkdir(parents=True)
        for k in range(2):
            name = f"ADE_{split[:5]}_{k:08d}"
            h, w = 20, 28
            Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
                base / "images" / split / (name + ".jpg")
            )
            sem = np.full((h, w), stuff_sem, np.uint8)
            sem[:4, :6] = 0  # void region
            sem[8:14, 6 : 12 + k] = sem_of_thing  # thing pixels in semantic map
            Image.fromarray(sem).save(base / "annotations" / split / (name + ".png"))
            ins = np.zeros((h, w, 3), np.uint8)
            ins[8:14, 6 : 12 + k, 0] = ins_cat
            ins[8:11, 6 : 12 + k, 1] = 1  # instance 1
            ins[11:14, 6 : 12 + k, 1] = 2  # instance 2
            Image.fromarray(ins).save(base / "annotations_instance" / split / (name + ".png"))

    for script in ("prepare_ade20k_sem_seg", "prepare_ade20k_pan_seg", "prepare_ade20k_ins_seg"):
        _load_script(script).main(str(root))
    return root, {"sem_of_thing": sem_of_thing, "stuff_sem": stuff_sem, "ins_cat": ins_cat}


def test_prepared_sem_seg_shift(ade_root):
    root, info = ade_root
    base = root / "ADEChallengeData2016"
    name = sorted(os.listdir(base / "annotations_detectron2" / "validation"))[0]
    out = np.asarray(Image.open(base / "annotations_detectron2" / "validation" / name))
    src = np.asarray(Image.open(base / "annotations" / "validation" / name))
    np.testing.assert_array_equal(out, src - np.uint8(1))
    assert (out[:4, :6] == 255).all()  # void -> 255


def test_prepared_panoptic_png_and_json(ade_root):
    root, info = ade_root
    base = root / "ADEChallengeData2016"
    with open(base / "ade20k_panoptic_val.json") as f:
        pan_json = json.load(f)
    assert len(pan_json["images"]) == 2 and len(pan_json["categories"]) == 150

    ann = pan_json["annotations"][0]
    png = np.asarray(Image.open(base / "ade20k_panoptic_val" / ann["file_name"]), np.uint8)
    ids = rgb2id(png)
    cats = {c["id"]: c for c in pan_json["categories"]}
    # one stuff + two thing segments, every json id present in the png
    assert len(ann["segments_info"]) == 3
    kinds = sorted(cats[s["category_id"]]["isthing"] for s in ann["segments_info"])
    assert kinds == [0, 1, 1]
    for seg in ann["segments_info"]:
        mask = ids == seg["id"]
        assert seg["area"] == int(mask.sum()) > 0
        assert seg["bbox"] == mask_bbox_xywh(mask)
        if cats[seg["category_id"]]["isthing"]:
            assert seg["category_id"] == info["sem_of_thing"] - 1
        else:
            assert seg["category_id"] == info["stuff_sem"] - 1
    # void region stays id 0
    assert (ids[:4, :6] == 0).all()


def test_prepared_instance_json(ade_root):
    root, info = ade_root
    base = root / "ADEChallengeData2016"
    with open(base / "ade20k_instance_val.json") as f:
        ins_json = json.load(f)
    assert len(ins_json["categories"]) == 100
    assert {c["id"] for c in ins_json["categories"]} == {
        v - 1 for v in ade20k_instance_to_semantic().values()
    }
    anns = [a for a in ins_json["annotations"] if a["image_id"].endswith("00000000")]
    assert len(anns) == 2  # two instances per image
    for a in anns:
        assert a["category_id"] == info["sem_of_thing"] - 1
        m = _rle_to_mask(dict(a["segmentation"], order="F"), 20, 28)
        assert a["area"] == int(m.sum()) > 0
        assert a["bbox"] == mask_bbox_xywh(m)


def test_ade20k_registration_and_loader(ade_root):
    root, info = ade_root
    from uni_encoder_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from uni_encoder_tpu.data.datasets import ade20k

    ade20k.register_all(str(root))
    items = DatasetCatalog.get("ade20k_panoptic_val")
    assert len(items) == 2
    it = items[0]
    assert os.path.exists(it["file_name"]) and os.path.exists(it["pan_seg_file_name"])
    assert os.path.exists(it["sem_seg_file_name"])
    assert len(it["segments_info"]) == 3
    # instance annotations attached, contiguous 0..99 category space
    assert len(it["annotations"]) == 2
    assert all(0 <= a["category_id"] < 100 for a in it["annotations"])
    meta = MetadataCatalog.get("ade20k_panoptic_val")
    assert meta.evaluator_type == "ade20k_panoptic_seg"
    assert len(meta.thing_dataset_id_to_contiguous_id) == 100
    assert len(DatasetCatalog.get("ade20k_instance_val")) == 2
    assert len(DatasetCatalog.get("ade20k_sem_seg_val")) == 2


def test_panoptic2detection_conversion(ade_root, tmp_path):
    root, info = ade_root
    base = root / "ADEChallengeData2016"
    mod = _load_script("panoptic2detection_coco_format")
    cats_file = tmp_path / "cats.json"
    with open(cats_file, "w") as f:
        json.dump(ade20k_150_categories(), f)
    out = tmp_path / "det.json"
    mod.convert(
        str(base / "ade20k_panoptic_val.json"),
        str(base / "ade20k_panoptic_val"),
        str(out),
        str(cats_file),
        things_only=True,
    )
    with open(out) as f:
        det = json.load(f)
    assert all("isthing" not in c for c in det["categories"])
    assert len(det["categories"]) == 100
    assert len(det["annotations"]) == 4  # 2 images x 2 things; stuff dropped
    assert [a["id"] for a in det["annotations"]] == list(range(4))
    for a in det["annotations"]:
        m = _rle_to_mask(dict(a["segmentation"], order="F"), 20, 28)
        assert int(m.sum()) == a["area"]


def test_coco_semantic_from_panoptic(tmp_path):
    mod = _load_script("prepare_coco_semantic_annos_from_panoptic_annos")
    # synthetic 2-category panoptic annotation
    seg_ids = np.zeros((8, 10), np.int64)
    seg_ids[:4] = 777
    seg_ids[4:, :5] = 1234
    png = id2rgb(seg_ids)
    segments = [
        {"id": 777, "category_id": 17},
        {"id": 1234, "category_id": 91},
    ]
    id_map = {17: 0, 91: 1}
    out = mod.panoptic_to_semantic(png, segments, id_map)
    assert (out[:4] == 0).all()
    assert (out[4:, :5] == 1).all()
    assert (out[4:, 5:] == 255).all()  # unlabeled -> 255
