"""Jitted inference pipelines (the engine's device-side half).

Replaces the reference's per-image OneFormer.forward + host post-processing
(oneformer_model.py:217-365 + retry_if_cuda_oom blocks): normalization,
padding to /32, the forward pass, full-resolution mask upsampling, crop to
the pre-pad image size, resize to the original resolution, and the
vectorized task inferences all run inside ONE jit per static input shape
(compiled once per shape bucket; Cityscapes eval is single-shape).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..inference.postprocess import (
    instance_inference,
    panoptic_inference,
    segments_info_from_arrays,
    semantic_inference,
)
from ..models.oneformer import UniEncoder
from ..ops import interpolate


def pad_to_multiple(h: int, w: int, div: int) -> Tuple[int, int]:
    return -(-h // div) * div, -(-w // div) * div


class Predictor:
    def __init__(self, cfg: Config, variables):
        self.cfg = cfg
        self.model = UniEncoder(cfg.model)
        self.variables = variables
        mc = cfg.model
        self.mean = jnp.asarray(mc.pixel_mean, jnp.float32)
        self.std = jnp.asarray(mc.pixel_std, jnp.float32)
        self.thing_mask = None  # set per dataset
        self.instance_label_remap = None  # ADE20K quirk, set per dataset
        self._seg_fns: Dict = {}
        self._seq_fns: Dict = {}

    def set_thing_ids(self, thing_contiguous_ids, dataset_name: str = ""):
        K = self.cfg.model.sem_seg_head.num_classes
        tm = np.zeros((K,), bool)
        for t in thing_contiguous_ids:
            tm[t] = True
        self.thing_mask = jnp.asarray(tm)
        # ADE20K instance quirk (reference oneformer_model.py:470-473): for
        # 'ade20k' datasets outside demo mode, instance labels are re-indexed
        # into the thing list (150-class ids -> 0..99 instance-json ids)
        self.instance_label_remap = None
        if "ade20k" in dataset_name and not self.cfg.model.is_demo:
            # non-thing entries stay -1: the reference's
            # thing_indices.index() raises on a non-thing label, so a stuff
            # prediction must be dropped before the remap, never silently
            # mapped to thing 0 (see infer_segmentation)
            remap = np.full((K,), -1, np.int32)
            for i, t in enumerate(sorted(thing_contiguous_ids)):
                remap[t] = i
            self.instance_label_remap = remap

    # ------------------------------------------------------------ segmentation
    def _seg_fn(self, padded_hw, image_hw, out_hw):
        key = (padded_hw, image_hw, out_hw)
        if key in self._seg_fns:
            return self._seg_fns[key]
        t = self.cfg.model.test

        @jax.jit
        def fn(variables, image_u8, task_tokens, thing_mask):
            img = (image_u8.astype(jnp.float32) - self.mean) / self.std
            ph, pw = padded_hw
            ih, iw = image_hw
            img = jnp.pad(img, ((0, ph - img.shape[0]), (0, pw - img.shape[1]), (0, 0)))
            out = self.model.apply(variables, img[None], task_tokens[None])
            logits = out["pred_logits"][0]  # (Q, K+1)
            masks = out["pred_masks"][0]  # (Q, ph/4, pw/4)
            # upsample to padded input size (bilinear, reference order)
            m = interpolate(masks.transpose(1, 2, 0)[None], size=(ph, pw), mode="bilinear")[0]
            # crop padding, resize to original resolution
            m = m[:ih, :iw]
            m = interpolate(m[None], size=out_hw, mode="bilinear")[0].transpose(2, 0, 1)

            res = {}
            if t.semantic_on:
                res["sem_seg"] = semantic_inference(logits, m)
            if t.panoptic_on:
                res["panoptic"] = panoptic_inference(
                    logits, m, thing_mask, t.object_mask_threshold, t.overlap_threshold
                )
            if t.instance_on or t.detection_on:
                res["instances"] = instance_inference(logits, m, t.detections_per_image)
            return res

        self._seg_fns[key] = fn
        return fn

    def infer_segmentation(self, item: Dict) -> Dict:
        image = item["image"]
        h, w = image.shape[:2]
        out_h = item.get("height", h)
        out_w = item.get("width", w)
        padded = pad_to_multiple(h, w, self.cfg.model.one_former.size_divisibility)
        fn = self._seg_fn(padded, (h, w), (out_h, out_w))
        assert self.thing_mask is not None, "call set_thing_ids() first"
        res = fn(
            self.variables,
            jnp.asarray(image),
            jnp.asarray(item["task_tokens"]),
            self.thing_mask,
        )
        out: Dict = {}
        if "sem_seg" in res:
            out["sem_seg"] = np.asarray(res["sem_seg"])
        if "panoptic" in res:
            pan = jax.tree_util.tree_map(np.asarray, res["panoptic"])
            out["panoptic_seg"] = (pan["panoptic_seg"], segments_info_from_arrays(pan))
        if "instances" in res:
            inst = jax.tree_util.tree_map(np.asarray, res["instances"])
            # panoptic mode keeps only thing classes (reference :461-468)
            if self.cfg.model.test.panoptic_on:
                tm = np.asarray(self.thing_mask)
                keep = tm[inst["labels"]]
                inst = {k: v[keep] for k, v in inst.items()}
            if self.cfg.model.is_demo:
                keep = inst["scores"] > self.cfg.model.test.object_mask_threshold
                inst = {k: v[keep] for k, v in inst.items()}
            if self.instance_label_remap is not None:
                # reference oneformer_model.py:470-473 (ade20k label re-index).
                # Drop non-thing predictions first: the remap table holds -1
                # for stuff classes (the reference's .index() would raise), so
                # they must not survive into the instance set.
                remapped = self.instance_label_remap[inst["labels"]]
                keep = remapped >= 0
                inst = {k: v[keep] for k, v in inst.items()}
                inst = dict(inst, labels=remapped[keep])
            out["instances"] = inst
        return out

    # ---------------------------------------------------------------- sequence
    def _seq_fn(self, hw):
        if hw in self._seq_fns:
            return self._seq_fns[hw]

        @jax.jit
        def fn(variables, image_u8, prev_u8):
            img = (image_u8.astype(jnp.float32) - self.mean) / self.std
            prev = (prev_u8.astype(jnp.float32) - self.mean) / self.std
            out = self.model.apply(
                variables, img[None], prev[None], method=UniEncoder.forward_sequence
            )
            return {
                "disp_results": out["disp"][0, ..., 0],
                "motion_mask": out["motion_mask"][0, ..., 0],
                "complete_flow": out["complete_flow"][0],
                "cam_T_cam": out["cam_T_cam"][0],
            }

        self._seq_fns[hw] = fn
        return fn

    def infer_sequence(self, item: Dict) -> Dict:
        image = item["image"]
        fn = self._seq_fn(image.shape[:2])
        res = fn(self.variables, jnp.asarray(image), jnp.asarray(item["prev_image"]))
        return jax.tree_util.tree_map(np.asarray, res)
