#!/usr/bin/env python3
"""Shift ADE20K semantic annotation PNGs to detectron2 convention.

Capability spec: reference datasets/prepare_ade20k_sem_seg.py — raw ADE20K
labels are 1..150 with 0 = ignore; training consumes 0..149 with 255 =
ignore, which one uint8 subtraction produces (0 wraps to 255).

Reads  $DETECTRON2_DATASETS/ADEChallengeData2016/annotations/{training,validation}
Writes $DETECTRON2_DATASETS/ADEChallengeData2016/annotations_detectron2/...
"""

import os
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def shift_labels(src: Path, dst: Path) -> None:
    arr = np.asarray(Image.open(src))
    assert arr.dtype == np.uint8, f"{src}: expected uint8, got {arr.dtype}"
    Image.fromarray(arr - np.uint8(1)).save(dst)


def main(root: str) -> None:
    base = Path(root) / "ADEChallengeData2016"
    for split in ("training", "validation"):
        src_dir = base / "annotations" / split
        dst_dir = base / "annotations_detectron2" / split
        dst_dir.mkdir(parents=True, exist_ok=True)
        files = sorted(src_dir.iterdir())
        for i, f in enumerate(files):
            shift_labels(f, dst_dir / f.name)
            if (i + 1) % 500 == 0:
                print(f"{split}: {i + 1}/{len(files)}")


if __name__ == "__main__":
    main(os.getenv("DETECTRON2_DATASETS", "datasets"))
