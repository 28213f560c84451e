"""Vectorized post-processing vs a direct Python re-statement of the
reference's sequential semantics (oneformer_model.py:373-489)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu.inference import (
    instance_inference,
    panoptic_inference,
    segments_info_from_arrays,
    semantic_inference,
)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _reference_panoptic(mask_cls, mask_pred, thing_ids, obj_thresh, overlap_thresh):
    """Sequential reference semantics (spec re-statement for testing)."""
    K = mask_cls.shape[1] - 1
    probs = _softmax(mask_cls)
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    keep = (labels != K) & (scores > obj_thresh)

    cur_scores = scores[keep]
    cur_classes = labels[keep]
    cur_masks = _sigmoid(mask_pred[keep])
    h, w = mask_pred.shape[-2:]
    panoptic = np.zeros((h, w), np.int32)
    segments = []
    if cur_masks.shape[0] == 0:
        return panoptic, segments
    cur_prob_masks = cur_scores[:, None, None] * cur_masks
    cur_mask_ids = cur_prob_masks.argmax(0)
    stuff_memory = {}
    current_id = 0
    for k in range(cur_classes.shape[0]):
        pred_class = int(cur_classes[k])
        isthing = pred_class in thing_ids
        mask_area = int((cur_mask_ids == k).sum())
        original_area = int((cur_masks[k] >= 0.5).sum())
        mask = (cur_mask_ids == k) & (cur_masks[k] >= 0.5)
        if mask_area > 0 and original_area > 0 and mask.sum() > 0:
            if mask_area / original_area < overlap_thresh:
                continue
            if not isthing:
                if pred_class in stuff_memory:
                    panoptic[mask] = stuff_memory[pred_class]
                    continue
                else:
                    stuff_memory[pred_class] = current_id + 1
            current_id += 1
            panoptic[mask] = current_id
            segments.append({"id": current_id, "isthing": bool(isthing), "category_id": pred_class})
    return panoptic, segments


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_panoptic_matches_sequential_reference(seed):
    rng = np.random.RandomState(seed)
    Q, K, H, W = 20, 7, 24, 32
    # biased logits so several queries survive the 0.8 threshold
    mask_cls = rng.randn(Q, K + 1).astype(np.float32) * 4
    mask_pred = rng.randn(Q, H, W).astype(np.float32) * 2
    thing_ids = {0, 1, 2}
    thing_mask = np.zeros(K, bool)
    for t in thing_ids:
        thing_mask[t] = True

    ref_pan, ref_segments = _reference_panoptic(mask_cls, mask_pred, thing_ids, 0.8, 0.8)

    out = jax.jit(
        lambda c, m: panoptic_inference(c, m, jnp.asarray(thing_mask), 0.8, 0.8)
    )(jnp.asarray(mask_cls), jnp.asarray(mask_pred))
    out = jax.tree_util.tree_map(np.asarray, out)

    np.testing.assert_array_equal(out["panoptic_seg"], ref_pan)
    assert segments_info_from_arrays(out) == ref_segments


def test_semantic_inference():
    rng = np.random.RandomState(0)
    Q, K, H, W = 10, 5, 8, 8
    mask_cls = rng.randn(Q, K + 1).astype(np.float32)
    mask_pred = rng.randn(Q, H, W).astype(np.float32)
    ours = np.asarray(semantic_inference(jnp.asarray(mask_cls), jnp.asarray(mask_pred)))
    ref = np.einsum("qc,qhw->chw", _softmax(mask_cls)[:, :-1], _sigmoid(mask_pred))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_instance_inference_matches_reference():
    rng = np.random.RandomState(0)
    Q, K, H, W = 12, 5, 16, 16
    topk = 10
    mask_cls = rng.randn(Q, K + 1).astype(np.float32)
    mask_pred = rng.randn(Q, H, W).astype(np.float32)

    out = instance_inference(jnp.asarray(mask_cls), jnp.asarray(mask_pred), topk)
    out = jax.tree_util.tree_map(np.asarray, out)

    scores = _softmax(mask_cls)[:, :-1]
    flat = scores.reshape(-1)
    top_idx = np.argsort(-flat)[:topk]
    ref_scores = flat[top_idx]
    ref_labels = top_idx % K
    ref_q = top_idx // K
    ref_masks = mask_pred[ref_q] > 0
    sig = _sigmoid(mask_pred[ref_q])
    binf = ref_masks.astype(np.float32)
    mask_scores = (sig * binf).sum((1, 2)) / (binf.sum((1, 2)) + 1e-6)

    # top_k order: both sorted descending by score
    np.testing.assert_allclose(np.sort(out["scores"])[::-1], np.sort(ref_scores * mask_scores)[::-1], rtol=1e-5)
    np.testing.assert_array_equal(np.sort(out["labels"]), np.sort(ref_labels))
    np.testing.assert_array_equal(np.sort(out["query_indices"]), np.sort(ref_q))
