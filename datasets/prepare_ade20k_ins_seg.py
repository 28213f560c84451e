#!/usr/bin/env python3
"""Build the ADE20K instance-segmentation COCO json.

Capability spec: reference datasets/prepare_ade20k_ins_seg.py — walks the
instance annotation PNGs (channel 0 = 1-based instance-category id,
channel 1 = instance id with 0 = void), emits one COCO detection json per
split with RLE segmentations, tight bboxes, areas, and category ids remapped
to the 0-based 150-class semantic ids (shared with the panoptic json — the
upstream comment stresses instance and panoptic must share category ids).

The reference reads category names from the ADE20K instance release's
``ade20k_instance_imgCatIds.json``; we synthesize the equivalent 100-entry
category list from the bundled instance->semantic table + the 150-class name
table, which yields the same ids and canonical names.
"""

import glob
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from uni_encoder_tpu.data.prep import (  # noqa: E402
    ade20k_150_categories,
    ade20k_instance_to_semantic,
    encode_rle,
    mask_bbox_xywh,
    rle_area,
    save_json,
)


def instance_annotations_for_image(ins_png: np.ndarray, image_id, ins_to_sem0, first_ann_id: int):
    """COCO annotation dicts for every instance in one annotation PNG."""
    cat0 = ins_png[..., 0].astype(np.int32) - 1
    ids = ins_png[..., 1]
    annos = []
    ann_id = first_ann_id
    for ins_id in np.unique(ids):
        if ins_id == 0:
            continue
        mask = ids == ins_id
        cats = np.unique(cat0[mask])
        assert len(cats) == 1
        rle = encode_rle(mask)
        annos.append(
            {
                "id": ann_id,
                "image_id": image_id,
                "iscrowd": 0,
                "category_id": int(ins_to_sem0[int(cats[0])]),
                "bbox": mask_bbox_xywh(mask),
                "segmentation": rle,
                "area": rle_area(rle),
            }
        )
        ann_id += 1
    return annos


def main(root: str) -> None:
    base = os.path.join(root, "ADEChallengeData2016")
    names = {c["id"]: c["name"] for c in ade20k_150_categories()}
    ins_to_sem0 = {k - 1: v - 1 for k, v in ade20k_instance_to_semantic().items()}
    categories = [
        {"id": sem0, "name": names[sem0]} for sem0 in sorted(set(ins_to_sem0.values()))
    ]

    for name, dirname in (("train", "training"), ("val", "validation")):
        image_dir = os.path.join(base, "images", dirname)
        ann_id = 1
        images, annotations = [], []
        for filename in sorted(glob.glob(os.path.join(image_dir, "*.jpg"))):
            image_id = os.path.basename(filename).rsplit(".", 1)[0]
            with Image.open(filename) as im:
                w, h = im.size
            images.append(
                {"id": image_id, "file_name": os.path.basename(filename), "width": w, "height": h}
            )
            ins = np.asarray(
                Image.open(os.path.join(base, "annotations_instance", dirname, image_id + ".png"))
            )
            assert ins.dtype == np.uint8
            annos = instance_annotations_for_image(ins, image_id, ins_to_sem0, ann_id)
            ann_id += len(annos)
            annotations.extend(annos)

        out = os.path.join(base, f"ade20k_instance_{name}.json")
        save_json({"images": images, "categories": categories, "annotations": annotations}, out)
        print(f"{name}: {len(images)} images, {len(annotations)} instances -> {out}")


if __name__ == "__main__":
    main(os.getenv("DETECTRON2_DATASETS", "datasets"))
