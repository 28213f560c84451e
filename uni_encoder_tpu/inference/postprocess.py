"""Vectorized task inference (post-processing) — pure device code.

Behavioral spec: reference model/oneformer_model.py —
  * semantic_inference (:367-371): softmax(cls)[:, :-1] (x) sigmoid(masks)
    einsum qc,qhw->chw;
  * panoptic_inference (:373-433): keep-filter by class score, per-pixel
    argmax of score-weighted sigmoid masks, per-query overlap filtering
    (mask_area/original_area >= overlap_threshold), first-seen stuff-class
    merging, sequential segment ids;
  * instance_inference (:435-489): flattened top-k over Q*K class scores,
    mask binarization at logit 0, mask-probability rescoring.

The reference's panoptic loop is a Python loop over <=150 queries with
.item() host syncs per query; here every step is a fixed-shape tensor op
(cumsum for id assignment, a (Q, Q) first-seen matrix for stuff merging, a
single scatter-free sum for the final id map), so the whole thing jits and
runs on-device.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import interpolate


def semantic_inference(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray) -> jnp.ndarray:
    """(Q, K+1) logits, (Q, H, W) mask logits -> (K, H, W) class probabilities."""
    cls = jax.nn.softmax(mask_cls, axis=-1)[..., :-1]
    masks = jax.nn.sigmoid(mask_pred)
    return jnp.einsum("qc,qhw->chw", cls, masks, preferred_element_type=jnp.float32)


def panoptic_inference(
    mask_cls: jnp.ndarray,  # (Q, K+1)
    mask_pred: jnp.ndarray,  # (Q, H, W) logits
    thing_mask: jnp.ndarray,  # (K,) bool — contiguous ids that are "things"
    object_mask_threshold: float,
    overlap_threshold: float,
) -> Dict[str, jnp.ndarray]:
    """Returns arrays: panoptic_seg (H, W) int32 plus per-query segment
    metadata (seg_id, label, isthing, is_new_segment) for host-side
    segments_info assembly."""
    Q, num_classes_p1 = mask_cls.shape
    K = num_classes_p1 - 1

    probs = jax.nn.softmax(mask_cls, axis=-1)
    scores = probs.max(axis=-1)
    labels = probs.argmax(axis=-1)
    keep = (labels != K) & (scores > object_mask_threshold)

    # dtype-following full-resolution pipeline: with bf16 mask logits the
    # (Q, H, W) sigmoid/argmax tensors stay bf16 (half the HBM traffic of
    # the f32 path); areas/ratios accumulate in f32/int32 exactly.
    sig = jax.nn.sigmoid(mask_pred)
    prob_masks = (scores.astype(sig.dtype))[:, None, None] * sig
    prob_masks = jnp.where(keep[:, None, None], prob_masks, jnp.asarray(-1.0, sig.dtype))
    ids = jnp.argmax(prob_masks, axis=0)  # (H, W) winner query per pixel

    q_idx = jnp.arange(Q)
    win = ids[None] == q_idx[:, None, None]  # (Q, H, W)
    binm = mask_pred >= 0  # sigmoid(x) >= 0.5 <=> x >= 0, dtype-exact
    mask_area = win.sum(axis=(1, 2))
    original_area = binm.sum(axis=(1, 2))
    final_mask = win & binm
    final_area = final_mask.sum(axis=(1, 2))

    ratio = mask_area / jnp.maximum(original_area, 1)
    valid = (
        keep
        & (mask_area > 0)
        & (original_area > 0)
        & (final_area > 0)
        & (ratio >= overlap_threshold)
    )

    safe_labels = jnp.clip(labels, 0, K - 1)
    isthing = thing_mask[safe_labels] & (labels != K)

    # first-seen stuff-class bookkeeping (reference stuff_memory_list)
    valid_stuff = valid & ~isthing
    same_label = labels[:, None] == labels[None, :]
    earlier = q_idx[None, :] < q_idx[:, None]  # earlier[k, j] = j < k
    exists_earlier = jnp.any(valid_stuff[None, :] & same_label & earlier, axis=1)
    is_first_stuff = valid_stuff & ~exists_earlier

    new_segment = valid & (isthing | is_first_stuff)
    seg_id = jnp.cumsum(new_segment.astype(jnp.int32))  # 1-based where new

    # stuff queries inherit the id of the first valid stuff query of their class
    stuff_id = jnp.sum(
        (is_first_stuff[None, :] & same_label).astype(jnp.int32) * seg_id[None, :], axis=1
    )
    assigned = jnp.where(isthing, seg_id, stuff_id) * valid.astype(jnp.int32)

    panoptic_seg = jnp.sum(assigned[:, None, None] * final_mask.astype(jnp.int32), axis=0)

    return {
        "panoptic_seg": panoptic_seg.astype(jnp.int32),
        "seg_id": seg_id.astype(jnp.int32),
        "label": labels.astype(jnp.int32),
        "isthing": isthing,
        "is_new_segment": new_segment,
    }


def segments_info_from_arrays(pan: Dict[str, np.ndarray]) -> List[Dict]:
    """Host-side: convert panoptic_inference arrays to d2-style segments_info."""
    infos = []
    seg_id = np.asarray(pan["seg_id"])
    label = np.asarray(pan["label"])
    isthing = np.asarray(pan["isthing"])
    new = np.asarray(pan["is_new_segment"])
    for k in range(len(seg_id)):
        if new[k]:
            infos.append(
                {"id": int(seg_id[k]), "isthing": bool(isthing[k]), "category_id": int(label[k])}
            )
    return infos


def instance_inference(
    mask_cls: jnp.ndarray,  # (Q, K+1)
    mask_pred: jnp.ndarray,  # (Q, H, W) logits
    topk: int,
) -> Dict[str, jnp.ndarray]:
    """Device part of instance inference: flattened top-k + mask rescoring.
    Thing-class filtering / demo thresholds are cheap host-side ops on the
    fixed-size (topk,) outputs."""
    Q, num_classes_p1 = mask_cls.shape
    K = num_classes_p1 - 1
    scores = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]  # (Q, K)
    flat = scores.reshape(-1)
    scores_per_image, topk_indices = jax.lax.top_k(flat, topk)
    labels_per_image = topk_indices % K
    q_indices = topk_indices // K

    masks = mask_pred[q_indices]  # (topk, H, W) logits
    bin_masks = masks > 0
    sig = jax.nn.sigmoid(masks)  # dtype-following; accumulate in f32
    mask_scores = jnp.sum(
        jnp.where(bin_masks, sig, jnp.zeros_like(sig)), axis=(1, 2), dtype=jnp.float32
    ) / (bin_masks.sum(axis=(1, 2), dtype=jnp.float32) + 1e-6)

    from ..utils.misc import masks_to_boxes

    return {
        "scores": scores_per_image * mask_scores,
        "labels": labels_per_image.astype(jnp.int32),
        "masks": bin_masks,
        # xyxy boxes from the binary masks (reference attaches pred_boxes to
        # Instances, oneformer_model.py:435-489 / BitMasks.get_bounding_boxes)
        "boxes": masks_to_boxes(bin_masks),
        "query_indices": q_indices.astype(jnp.int32),
    }


def sem_seg_postprocess(
    result: jnp.ndarray, img_size: Tuple[int, int], output_height: int, output_width: int
) -> jnp.ndarray:
    """d2 sem_seg_postprocess: crop the padded region, then bilinear-resize
    channel maps (C, H, W) to the original resolution."""
    result = result[:, : img_size[0], : img_size[1]]
    x = result.transpose(1, 2, 0)[None]  # (1, H, W, C)
    x = interpolate(x, size=(output_height, output_width), mode="bilinear", align_corners=False)
    return x[0].transpose(2, 0, 1)
