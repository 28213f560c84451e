#!/usr/bin/env python3
"""Convert COCO panoptic-format ground truth to detection format.

Capability spec: reference datasets/panoptic2detection_coco_format.py —
every panoptic segment becomes a detection annotation whose segmentation is
the compressed RLE of its pixel mask (decoded from the color PNG);
``--things_only`` drops stuff segments; output categories lose the
``isthing`` flag; annotation ids are renumbered 0..N-1 in order.
"""

import argparse
import json
import multiprocessing as mp
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from uni_encoder_tpu.data.prep import encode_rle, rgb2id, save_json  # noqa: E402


def convert_annotation(annotation, categories, segmentations_folder, things_only):
    """Detection annotations for one panoptic annotation record."""
    file_name = annotation["file_name"].rsplit(".", 1)[0] + ".png"
    pan = rgb2id(np.asarray(Image.open(os.path.join(segmentations_folder, file_name)), np.uint8))
    out = []
    for seg in annotation["segments_info"]:
        if things_only and categories[seg["category_id"]]["isthing"] != 1:
            continue
        seg = dict(seg)
        mask = (pan == seg.pop("id")).astype(np.uint8)
        seg["image_id"] = annotation["image_id"]
        seg["segmentation"] = encode_rle(mask)
        out.append(seg)
    return out


def convert(
    input_json_file,
    segmentations_folder,
    output_json_file,
    categories_json_file,
    things_only,
    processes=None,
):
    if segmentations_folder is None:
        segmentations_folder = input_json_file.rsplit(".", 1)[0]
    with open(input_json_file) as f:
        d = json.load(f)
    with open(categories_json_file) as f:
        categories = {c["id"]: c for c in json.load(f)}

    jobs = [(a, categories, segmentations_folder, things_only) for a in d["annotations"]]
    if processes == 1 or mp.cpu_count() == 1:
        per_image = [convert_annotation(*j) for j in jobs]
    else:
        with mp.Pool(processes=processes) as pool:
            per_image = pool.starmap(convert_annotation, jobs, chunksize=50)
    annotations = [ann for group in per_image for ann in group]
    for i, ann in enumerate(annotations):
        ann["id"] = i
    d["annotations"] = annotations

    out_categories = []
    for c in d["categories"]:
        if things_only and c["isthing"] != 1:
            continue
        c = dict(c)
        c.pop("isthing", None)
        out_categories.append(c)
    d["categories"] = out_categories
    save_json(d, output_json_file)
    print(f"wrote {len(annotations)} annotations -> {output_json_file}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description="panoptic COCO format -> detection COCO format")
    ap.add_argument("--things_only", action="store_true", help="discard stuff classes")
    args = ap.parse_args()

    root = os.path.join(os.getenv("DETECTRON2_DATASETS", "datasets"), "coco")
    convert(
        os.path.join(root, "annotations", "panoptic_val2017.json"),
        os.path.join(root, "panoptic_val2017"),
        os.path.join(root, "annotations", "panoptic2instances_val2017.json"),
        os.path.join("datasets", "panoptic_coco_categories.json"),
        args.things_only,
    )
