"""Training-time dataset mappers.

Capability spec: reference model/data/dataset_mappers/ —
  * OneFormerUnifiedDatasetMapper (:93-160) + the multi-pass cityscapes
    mapper's segmentation branch (:314-437): resize-shortest-edge from a
    scale list, fixed absolute crop (pad value 128 / ignore 255), SSD-style
    color augmentation, task sampled by TASK_PROB (semantic .33 /
    instance .66 / else panoptic), per-task targets built from the panoptic
    PNG, per-query text prompts ("a {task} photo", "a photo with a {cls}");
  * the sequence branch / DepthCityscapesMapper (:438-554, :117-245):
    3-frame photometric pipeline — identical geometric transform across
    frames, color jitter applied jointly while `orig_*` uncolored copies are
    kept as photometric targets, K/inv_K rescaled to the crop with h-flip
    u0 correction;
  * custom_augs.py: SSD color augment (brightness/contrast/saturation/hue).

Targets are fixed-shape: labels/masks padded to `max_instances` with a
validity mask (TPU-friendly), masks at stride-4 resolution for the
point-sampled criterion.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..config import SEG_MIN_SIZES_TRAIN
from .cityscapes_labels import IGNORE_LABEL, NUM_CLASSES, THING_TRAIN_IDS
from .mappers import intrinsics_from_camera_json, read_image
from .tokenizer import tokenize_task
from ..native import decode_panoptic_ids, resize_bilinear_u8


# ----------------------------------------------------------------- augmenters
def color_aug_ssd(rng: np.random.RandomState, img: np.ndarray) -> np.ndarray:
    """SSD photometric distortion (d2 ColorAugSSDTransform defaults:
    brightness delta 32, contrast/saturation [0.5, 1.5], hue delta 18)."""
    img = img.astype(np.float32)
    if rng.randint(2):
        img += rng.uniform(-32, 32)
    if rng.randint(2):
        img *= rng.uniform(0.5, 1.5)
    # saturation / hue in HSV — each an independent 1/2-probability coin,
    # drawn unconditionally so RNG stream consumption is order-independent
    # (matches d2 ColorAugSSDTransform semantics)
    do_sat = bool(rng.randint(2))
    do_hue = bool(rng.randint(2))
    if do_sat or do_hue:
        import cv2

        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(
            np.float32
        )
        if do_sat:
            hsv[..., 1] *= rng.uniform(0.5, 1.5)
        if do_hue:
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(-18, 18)) % 180
        img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
            np.float32
        )
    return np.clip(img, 0, 255).astype(np.uint8)


def _resize(img: np.ndarray, hw: Tuple[int, int], nearest=False) -> np.ndarray:
    if img.shape[:2] == hw:
        return img
    if nearest:
        return np.asarray(Image.fromarray(img).resize((hw[1], hw[0]), Image.NEAREST))
    return resize_bilinear_u8(img, hw[0], hw[1])


# ------------------------------------------------------------------- seg task
class SegmentationTrainMapper:
    def __init__(
        self,
        crop_size: Tuple[int, int] = (512, 1024),
        min_sizes: Sequence[int] = SEG_MIN_SIZES_TRAIN,
        max_size: int = 4096,
        task_prob_semantic: float = 0.33,
        task_prob_instance: float = 0.66,
        max_instances: int = 100,
        color_aug: bool = True,
        seed: int = 0,
        num_texts: int = 134,  # NUM_OBJECT_QUERIES - TEXT_ENCODER.N_CTX
    ):
        self.crop_size = crop_size
        self.min_sizes = list(min_sizes)
        self.max_size = max_size
        self.p_sem = task_prob_semantic
        self.p_inst = task_prob_instance
        self.max_instances = max_instances
        self.color_aug = color_aug
        self.num_texts = num_texts
        self.rng = np.random.RandomState(seed)

    def __call__(self, item: Dict) -> Dict:
        rng = self.rng
        image = read_image(item["file_name"])
        pan_png = np.asarray(Image.open(item["pan_seg_file_name"]).convert("RGB"))
        pan_ids = decode_panoptic_ids(pan_png)

        # resize shortest edge (choice) capped by max_size
        h, w = image.shape[:2]
        min_size = self.min_sizes[rng.randint(len(self.min_sizes))]
        scale = min_size / min(h, w)
        if max(h, w) * scale > self.max_size:
            scale = self.max_size / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        image = _resize(image, (nh, nw))
        pan_ids = np.asarray(
            Image.fromarray(pan_ids.astype(np.int32), mode="I").resize((nw, nh), Image.NEAREST)
        )

        # random flip
        if rng.randint(2):
            image = image[:, ::-1]
            pan_ids = pan_ids[:, ::-1]

        # absolute crop (pad 128 / void 0 if short)
        ch, cw = self.crop_size
        if nh < ch or nw < cw:
            pad_h, pad_w = max(0, ch - nh), max(0, cw - nw)
            image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=128)
            pan_ids = np.pad(pan_ids, ((0, pad_h), (0, pad_w)), constant_values=0)
            nh, nw = image.shape[:2]
        y0 = rng.randint(nh - ch + 1)
        x0 = rng.randint(nw - cw + 1)
        image = np.ascontiguousarray(image[y0 : y0 + ch, x0 : x0 + cw])
        pan_ids = np.ascontiguousarray(pan_ids[y0 : y0 + ch, x0 : x0 + cw])

        if self.color_aug:
            image = color_aug_ssd(rng, image)

        # task sampling (reference TASK_PROB semantics)
        p = rng.rand()
        if p < self.p_sem:
            task = "semantic"
        elif p < self.p_inst:
            task = "instance"
        else:
            task = "panoptic"

        labels, masks, texts = self._targets(pan_ids, item["segments_info"], task)
        N = self.max_instances
        n = min(len(labels), N)
        pad_labels = np.zeros((N,), np.int32)
        pad_masks = np.zeros((N, ch // 4, cw // 4), bool)
        valid = np.zeros((N,), bool)
        for i in range(n):
            pad_labels[i] = labels[i]
            m = masks[i].astype(np.uint8)
            pad_masks[i] = np.asarray(
                Image.fromarray(m * 255).resize((cw // 4, ch // 4), Image.BILINEAR)
            ) > 127
            valid[i] = True

        # per-query text list, padded with the task prompt (reference
        # oneformer_unified_dataset_mapper.py:143-170: texts initialized to
        # "a {task} photo" and overwritten per object instance)
        text_list = [f"a {task} photo"] * self.num_texts
        for i, t in enumerate(texts[1:][: self.num_texts]):
            text_list[i] = t
        text_tokens = np.stack(
            [np.asarray(tokenize_task(t), np.int32) for t in text_list]
        )
        return {
            "images": image,
            "task_tokens": np.asarray(tokenize_task(f"The task is {task}"), np.int32),
            "text_tokens": text_tokens,
            "labels": pad_labels,
            "masks": pad_masks,
            "valid": valid,
            "task": task,
        }

    def _targets(self, pan_ids: np.ndarray, segments_info: List[Dict], task: str):
        labels, masks, texts = [], [], [f"a {task} photo"]
        from .cityscapes_labels import CLASS_NAMES

        thing_set = set(THING_TRAIN_IDS)
        if task == "semantic":
            # one mask per present class
            for cls in range(NUM_CLASSES):
                m = np.zeros(pan_ids.shape, bool)
                for seg in segments_info:
                    if seg["category_id"] == cls:
                        m |= pan_ids == seg["id"]
                if m.any():
                    labels.append(cls)
                    masks.append(m)
                    texts.append(f"a photo with a {CLASS_NAMES[cls]}")
        else:
            for seg in segments_info:
                if seg.get("iscrowd", 0):
                    continue
                cls = seg["category_id"]
                if task == "instance" and cls not in thing_set:
                    continue
                m = pan_ids == seg["id"]
                if m.any():
                    labels.append(cls)
                    masks.append(m)
                    texts.append(f"a photo with a {CLASS_NAMES[cls]}")
        return labels, masks, texts


# -------------------------------------------------------------- sequence task
class SequenceTrainMapper:
    def __init__(self, hw: Tuple[int, int] = (192, 512), color_jitter: bool = True, seed: int = 0):
        self.hw = hw
        self.color_jitter = color_jitter
        self.rng = np.random.RandomState(seed)

    def _jitter_params(self):
        r = self.rng
        return dict(
            brightness=r.uniform(0.8, 1.2),
            contrast=r.uniform(0.8, 1.2),
            saturation=r.uniform(0.8, 1.2),
            hue=r.uniform(-0.05, 0.05),
        )

    def _apply_jitter(self, img: np.ndarray, p: Dict) -> np.ndarray:
        import cv2

        out = img.astype(np.float32) * p["brightness"]
        mean = out.mean(axis=(0, 1), keepdims=True)
        out = (out - mean) * p["contrast"] + mean
        hsv = cv2.cvtColor(np.clip(out, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(
            np.float32
        )
        hsv[..., 1] *= p["saturation"]
        hsv[..., 0] = (hsv[..., 0] + p["hue"] * 180) % 180
        return cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8), cv2.COLOR_HSV2RGB)

    def __call__(self, item: Dict) -> Dict:
        h, w = self.hw
        cur = read_image(item["file_name"], (w, h))
        prev = read_image(item["left_prev_image_file"], (w, h))
        nxt = read_image(item["left_nxt_image_file"], (w, h))

        flip = bool(self.rng.randint(2))
        if flip:
            cur, prev, nxt = cur[:, ::-1], prev[:, ::-1], nxt[:, ::-1]

        # photometric targets keep the *uncolored* frames (reference keeps
        # orig_* copies; color jitter only feeds the network input)
        out = {
            "orig_images": np.ascontiguousarray(cur),
            "orig_prev_images": np.ascontiguousarray(prev),
            "orig_next_images": np.ascontiguousarray(nxt),
        }
        if self.color_jitter:
            p = self._jitter_params()
            cur, prev, nxt = (self._apply_jitter(x, p) for x in (cur, prev, nxt))
        out.update(
            images=np.ascontiguousarray(cur),
            prev_images=np.ascontiguousarray(prev),
            next_images=np.ascontiguousarray(nxt),
        )

        cam_file = item.get("cam_info_file")
        if cam_file:
            with open(cam_file) as f:
                cam = json.load(f)
            K, inv_K = intrinsics_from_camera_json(cam, self.hw)
            if flip:
                K[0, 2] = w - 1 - K[0, 2]  # h-flip u0 correction
                inv_K = np.linalg.inv(K).astype(np.float32)
        else:
            K = np.eye(4, dtype=np.float32)
            K[0, 0] = K[1, 1] = 0.58 * w  # KITTI-style default intrinsics
            K[0, 2], K[1, 2] = 0.5 * w, 0.5 * h
            inv_K = np.linalg.inv(K).astype(np.float32)
        out["K"], out["inv_K"] = K, inv_K
        return out


class BalancedSampler:
    """Infinite 1:1 interleave of segmentation and sequence items
    (reference model/utils/data_sampler.py:5-51)."""

    def __init__(self, seg_items: List, seq_items: List, seed: int = 0):
        self.seg_items = seg_items
        self.seq_items = seq_items
        self.rng = np.random.RandomState(seed)

    def __iter__(self):
        while True:
            si = self.rng.permutation(len(self.seg_items))
            qi = self.rng.permutation(len(self.seq_items))
            for a, b in zip(si, qi):
                yield ("segmentation", self.seg_items[a])
                yield ("sequence", self.seq_items[b])
