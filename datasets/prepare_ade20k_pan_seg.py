#!/usr/bin/env python3
"""Build ADE20K panoptic ground truth (PNGs + COCO-panoptic json).

Capability spec: reference datasets/prepare_ade20k_pan_seg.py — combines the
semantic annotation PNG (1..150, 0=void) with the instance annotation PNG
(channel 0 = instance-category id - needs +? see below; channel 1 = instance
id, 0=void) into panopticapi-style color PNGs plus a json with
images/annotations/categories. Stuff segments are painted first from the
semantic map; thing segments from the instance map override them (upstream
note: the two annotations overlap). Per segment the json records id
(= rgb2id of the painted color), 0-based category_id, area, bbox, iscrowd=0.

Conventions reproduced exactly:
* semantic category = png - 1 (255 -> ignored);
* instance category channel is 1-based -> -1 for 0-based;
* instance ids start at 1 (0 is void);
* a thing's semantic category comes from the instance->semantic table;
* stuff = any non-thing semantic category present in the image.
"""

import glob
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from uni_encoder_tpu.data.prep import (  # noqa: E402
    IdGenerator,
    ade20k_150_categories,
    ade20k_instance_to_semantic,
    mask_bbox_xywh,
    rgb2id,
    save_json,
)


def build_panoptic_for_image(
    sem_png: np.ndarray,
    ins_png: np.ndarray,
    categories_dict,
    ins_to_sem0,
    id_generator: IdGenerator,
):
    """Returns (pan_seg rgb uint8 (H, W, 3), segments_info list)."""
    sem0 = sem_png.astype(np.int32) - 1  # -1 == void
    ins_cat0 = ins_png[..., 0].astype(np.int32) - 1
    ins_ids = ins_png[..., 1]

    pan = np.zeros(sem_png.shape + (3,), dtype=np.uint8)
    segments = []

    def paint(mask: np.ndarray, cat0: int) -> None:
        seg_id, color = id_generator.get_id_and_color(cat0)
        pan[mask] = color
        segments.append(
            {
                "id": seg_id,
                "category_id": int(cat0),
                "area": int(mask.sum()),
                "bbox": mask_bbox_xywh(mask),
                "iscrowd": 0,
            }
        )

    # stuff first (things overwrite where the annotations overlap)
    for cat0 in np.unique(sem0):
        if cat0 < 0 or categories_dict[int(cat0)]["isthing"]:
            continue
        paint(sem0 == cat0, int(cat0))

    for ins_id in np.unique(ins_ids):
        if ins_id == 0:
            continue
        mask = ins_ids == ins_id
        cats = np.unique(ins_cat0[mask])
        assert len(cats) == 1, f"instance {ins_id} spans categories {cats}"
        paint(mask, ins_to_sem0[int(cats[0])])

    return pan, segments


def main(root: str) -> None:
    base = os.path.join(root, "ADEChallengeData2016")
    categories = ade20k_150_categories()
    categories_dict = {c["id"]: c for c in categories}
    # 0-based instance-annotation category -> 0-based semantic category
    ins_to_sem0 = {k - 1: v - 1 for k, v in ade20k_instance_to_semantic().items()}

    for name, dirname in (("train", "training"), ("val", "validation")):
        image_dir = os.path.join(base, "images", dirname)
        out_dir = os.path.join(base, f"ade20k_panoptic_{name}")
        os.makedirs(out_dir, exist_ok=True)

        images, annotations = [], []
        for filename in sorted(glob.glob(os.path.join(image_dir, "*.jpg"))):
            image_id = os.path.basename(filename).rsplit(".", 1)[0]
            with Image.open(filename) as im:
                w, h = im.size
            images.append(
                {"id": image_id, "file_name": os.path.basename(filename), "width": w, "height": h}
            )

            sem = np.asarray(Image.open(os.path.join(base, "annotations", dirname, image_id + ".png")))
            ins = np.asarray(
                Image.open(os.path.join(base, "annotations_instance", dirname, image_id + ".png"))
            )
            assert sem.dtype == np.uint8 and ins.dtype == np.uint8

            id_gen = IdGenerator(categories_dict)
            pan, segments = build_panoptic_for_image(sem, ins, categories_dict, ins_to_sem0, id_gen)
            Image.fromarray(pan).save(os.path.join(out_dir, image_id + ".png"))
            annotations.append(
                {"image_id": image_id, "file_name": image_id + ".png", "segments_info": segments}
            )

        save_json(
            {"images": images, "annotations": annotations, "categories": categories},
            os.path.join(base, f"ade20k_panoptic_{name}.json"),
        )
        print(f"{name}: {len(images)} images -> {out_dir}")


if __name__ == "__main__":
    main(os.getenv("DETECTRON2_DATASETS", "datasets"))
