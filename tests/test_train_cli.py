"""train.py CLI smoke: synthetic mini-Cityscapes (panoptic train split +
3-frame sequence split with camera jsons) -> dataset registration ->
BalancedSampler/mappers -> 2 jitted train steps -> metric json + orbax
checkpoint on disk. Covers the entry-point glue the trainer-level tests
bypass (reference analog: train_net.py main/launch — the release is
eval-only, so the loop itself is capability-completion; see train.py
docstring). Slow-marked: one micro-model train-step compile on CPU."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

H, W = 64, 128


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _make_train_fixture(root):
    rng = np.random.RandomState(0)

    # ---- segmentation train split (cityscapes_fine_panoptic_train)
    anns = []
    for i in range(2):
        stem = f"fakecity_{i:06d}_000019"
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        _write_png(
            os.path.join(root, "cityscapes/leftImg8bit/train/fakecity",
                         stem + "_leftImg8bit.png"), img)

        pan_id = np.zeros((H, W), np.int64)
        pan_id[:, : W // 2] = 7           # road (stuff, dataset id 7)
        pan_id[:, W // 2 :] = 26 * 1000 + 1  # one car instance (dataset id 26)
        segments = [
            {"id": 7, "category_id": 7, "iscrowd": 0},
            {"id": 26 * 1000 + 1, "category_id": 26, "iscrowd": 0},
        ]
        pan_png = np.stack(
            [pan_id % 256, (pan_id // 256) % 256, pan_id // 256 ** 2], axis=-1
        ).astype(np.uint8)
        _write_png(
            os.path.join(root, "cityscapes/gtFine/cityscapes_panoptic_train",
                         stem + "_gtFine_panoptic.png"), pan_png)
        sem = np.zeros((H, W), np.uint8)
        sem[:, W // 2 :] = 13
        _write_png(
            os.path.join(root, "cityscapes/gtFine/train/fakecity",
                         stem + "_gtFine_labelTrainIds.png"), sem)
        anns.append({"image_id": stem, "file_name": stem + "_gtFine_panoptic.png",
                     "segments_info": segments})
    with open(os.path.join(root, "cityscapes/gtFine/cityscapes_panoptic_train.json"), "w") as f:
        json.dump({"annotations": anns}, f)

    # ---- sequence train split (cityscapes_sequence_crop_full_sequence_train)
    seq_root = os.path.join(root, "cityscapes_full_crop")
    lines = []
    for i in range(2):
        fid = 10 + 4 * i
        stem = f"fakecity_{i:06d}_{fid:06d}"
        lines.append(f"fakecity fakecity_{i:06d}_{fid:06d}")
        for off in (-2, 0, 2):
            frame = f"fakecity_{i:06d}_{fid + off:06d}_leftImg8bit.png"
            _write_png(
                os.path.join(seq_root, "leftImg8bit_sequence/train/fakecity", frame),
                rng.randint(0, 255, (H, W, 3), np.uint8))
        cam = {"intrinsic": {"fx": 2262.52, "fy": 2265.30, "u0": 1096.98, "v0": 513.14}}
        cam_path = os.path.join(seq_root, "camera/train/fakecity", stem + "_camera.json")
        os.makedirs(os.path.dirname(cam_path), exist_ok=True)
        with open(cam_path, "w") as f:
            json.dump(cam, f)
    os.makedirs(seq_root, exist_ok=True)
    with open(os.path.join(seq_root, "train_files.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


MICRO_YAML = """
model:
  backbone:
    name: swin
    swin:
      embed_dim: 16
      depths: [1, 1, 1, 1]
      num_heads: [1, 2, 4, 8]
  one_former:
    num_object_queries: 8
    dec_layers: 2
    class_dec_layers: 1
    dim_feedforward: 64
    hidden_dim: 32
    nheads: 4
    train_num_points: 64
  sem_seg_head:
    num_classes: 19
    transformer_enc_layers: 1
    convs_dim: 32
    mask_dim: 32
  text_encoder:
    width: 32
    num_layers: 1
    proj_num_layers: 1
    n_ctx: 2
  is_train: true
  num_depth_scales: 2
input:
  seg_crop_train: [64, 128]
  seg_min_size_train: [64]
  seg_max_size_train: 128
  depth_hw_train: [64, 128]
solver:
  ims_per_batch: 4
  max_iter: 2
"""


@pytest.mark.slow
def test_train_cli_two_steps(tmp_path, monkeypatch):
    root = str(tmp_path / "data")
    _make_train_fixture(root)
    cfg_path = str(tmp_path / "micro.yaml")
    with open(cfg_path, "w") as f:
        f.write(MICRO_YAML)
    out_dir = str(tmp_path / "run")

    import train as train_cli

    monkeypatch.setattr(sys, "argv", [
        "train.py", "--config", cfg_path, "--output-dir", out_dir,
        "--max-iter", "2", "--batch", "2", "--num-devices", "1",
        "--datasets-root", root, "--log-period", "1", "--checkpoint-period", "2",
    ])
    train_cli.main()

    # metrics written every iteration, finite loss
    with open(os.path.join(out_dir, "metrics.json")) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    assert len(recs) >= 2
    assert np.isfinite(recs[-1]["loss"])
    assert np.isfinite(recs[-1]["loss_seg"])
    assert np.isfinite(recs[-1]["loss_monodepth"])
    # a checkpoint landed (max_iter == checkpoint_period == 2)
    with open(os.path.join(out_dir, "last_checkpoint")) as f:
        assert f.read().strip() == "step_2"
    assert os.path.isdir(os.path.join(out_dir, "step_2")), os.listdir(out_dir)
