#!/usr/bin/env python3
"""Derive COCO semantic-segmentation PNGs from the panoptic annotations.

Capability spec: reference
datasets/prepare_coco_semantic_annos_from_panoptic_annos.py — for every
panoptic annotation, decode the color PNG to segment ids and write a uint8
semantic PNG where each category id is remapped to its contiguous index in
the 133-entry COCO panoptic category list and unlabeled pixels are 255.

The category list (``panoptic_coco_categories.json``, the standard
panopticapi asset the upstream detectron2 constant was generated from) is
read from the datasets root or an explicit --categories path.
"""

import argparse
import functools
import json
import multiprocessing as mp
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from uni_encoder_tpu.data.prep import rgb2id  # noqa: E402


def panoptic_to_semantic(pan_png: np.ndarray, segments, id_map) -> np.ndarray:
    seg_ids = rgb2id(pan_png)
    out = np.full(seg_ids.shape, 255, dtype=np.uint8)
    for seg in segments:
        out[seg_ids == seg["id"]] = id_map[seg["category_id"]]
    return out


def _worker(job, id_map):
    src, dst, segments = job
    pan = np.asarray(Image.open(src), dtype=np.uint8)
    Image.fromarray(panoptic_to_semantic(pan, segments, id_map)).save(dst)


def convert_split(panoptic_json, panoptic_root, sem_seg_root, categories, processes=None):
    os.makedirs(sem_seg_root, exist_ok=True)
    assert len(categories) <= 254
    id_map = {c["id"]: i for i, c in enumerate(categories)}

    with open(panoptic_json) as f:
        obj = json.load(f)
    jobs = [
        (
            os.path.join(panoptic_root, a["file_name"]),
            os.path.join(sem_seg_root, a["file_name"]),
            a["segments_info"],
        )
        for a in obj["annotations"]
    ]
    procs = processes or max(mp.cpu_count() // 2, 4)
    if processes == 1 or mp.cpu_count() == 1:
        for job in jobs:
            _worker(job, id_map)
    else:
        with mp.Pool(processes=procs) as pool:
            pool.map(functools.partial(_worker, id_map=id_map), jobs, chunksize=100)
    print(f"wrote {len(jobs)} semantic PNGs -> {sem_seg_root}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--categories", default=None, help="panoptic_coco_categories.json path")
    args = ap.parse_args()

    root = os.path.join(os.getenv("DETECTRON2_DATASETS", "datasets"), "coco")
    cat_path = args.categories or os.path.join("datasets", "panoptic_coco_categories.json")
    with open(cat_path) as f:
        categories = json.load(f)

    for split in ("val2017", "train2017"):
        convert_split(
            os.path.join(root, "annotations", f"panoptic_{split}.json"),
            os.path.join(root, f"panoptic_{split}"),
            os.path.join(root, f"panoptic_semseg_{split}"),
            categories,
        )
