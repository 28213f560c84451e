"""Golden parity of the fused Pallas multi-task postprocess against the
unfused reference pipeline (inference/postprocess.py) — same inputs, the
kernel runs in interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu.inference.postprocess import (
    instance_inference,
    panoptic_inference,
    semantic_inference,
)
from uni_encoder_tpu.inference.fused_postprocess import fused_multitask_inference
from uni_encoder_tpu.ops import interpolate
from uni_encoder_tpu.utils.misc import masks_to_boxes


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_unfused(seed):
    rng = np.random.RandomState(seed)
    Q, K = 20, 7
    h, w = 16, 32
    H, W = 4 * h, 4 * w
    # well-separated logits: blobby masks with generic (non-razor-edge)
    # thresholds so bf16 associativity differences cannot flip decisions
    yy, xx = np.mgrid[0:h, 0:w]
    masks = np.zeros((Q, h, w), np.float32)
    for q in range(Q):
        cy, cx = rng.randint(0, h), rng.randint(0, w)
        r = rng.uniform(2, 8)
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        masks[q] = (r - d) * rng.uniform(0.5, 2.0)
    cls = rng.randn(Q, K + 1).astype(np.float32) * 3
    thing_mask = np.zeros(K, bool)
    thing_mask[K // 2 :] = True

    mask_cls = jnp.asarray(cls)
    mask_pred = jnp.asarray(masks, jnp.bfloat16)
    tm = jnp.asarray(thing_mask)

    fused = fused_multitask_inference(
        mask_cls, mask_pred, tm,
        object_mask_threshold=0.3, overlap_threshold=0.5, topk=Q,
        interpret=True,
    )
    fused = jax.tree_util.tree_map(np.asarray, fused)

    # ---- unfused reference path
    up = interpolate(
        mask_pred.transpose(1, 2, 0)[None], size=(H, W), mode="bilinear"
    )[0].transpose(2, 0, 1)
    sem = semantic_inference(mask_cls, up)
    pan = panoptic_inference(mask_cls, up, tm, 0.3, 0.5)
    inst = instance_inference(mask_cls, up, Q)

    # per-query wiring must agree exactly (areas -> valid -> ids)
    np.testing.assert_array_equal(fused["seg_id"], np.asarray(pan["seg_id"]))
    sem_arg = np.asarray(sem.argmax(0))
    mismatch = (fused["sem_seg_argmax"] != sem_arg).mean()
    assert mismatch < 3e-3, mismatch

    # pixel maps may differ at bf16 winner-tie / threshold-edge pixels only
    # (measured: ~0.2% on this fixture, 94% of them with winner margins
    # < 5e-3 and the rest with mask logits exactly 0.0)
    pan_ref = np.asarray(pan["panoptic_seg"])
    mismatch = (fused["panoptic_seg"] != pan_ref).mean()
    assert mismatch < 3e-3, mismatch
    np.testing.assert_array_equal(fused["label"], np.asarray(pan["label"]))
    np.testing.assert_array_equal(fused["isthing"], np.asarray(pan["isthing"]))
    np.testing.assert_array_equal(
        fused["is_new_segment"], np.asarray(pan["is_new_segment"])
    )

    np.testing.assert_array_equal(fused["labels"], np.asarray(inst["labels"]))
    np.testing.assert_array_equal(
        fused["query_indices"], np.asarray(inst["query_indices"])
    )
    np.testing.assert_allclose(
        fused["scores"], np.asarray(inst["scores"]), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        fused["boxes"], np.asarray(inst["boxes"]), atol=1.0
    )


def test_fused_instance_strict_on_zero_logits():
    """Exactly-zero mask logits are INSIDE for panoptic (sigmoid >= 0.5) but
    OUTSIDE for instance rescoring/boxes (reference mask_pred > 0); the fused
    kernel keeps both bits — a zeroed border must not inflate boxes/areas."""
    Q, K = 8, 3
    h, w = 16, 32
    H, W = 4 * h, 4 * w
    masks = np.zeros((Q, h, w), np.float32)  # exact zeros everywhere...
    masks[:, 6:10, 8:16] = 5.0  # ...except a strictly-positive blob
    masks[:, 0:2, :] = -4.0  # and a negative strip
    cls = np.full((Q, K + 1), -2.0, np.float32)
    cls[:, 1] = 3.0  # all queries confidently class 1
    tm = jnp.asarray(np.array([False, True, False]))

    fused = fused_multitask_inference(
        jnp.asarray(cls), jnp.asarray(masks, jnp.bfloat16), tm,
        object_mask_threshold=0.3, overlap_threshold=0.5, topk=Q,
        interpret=True,
    )
    fused = jax.tree_util.tree_map(np.asarray, fused)

    up = interpolate(
        jnp.asarray(masks, jnp.bfloat16).transpose(1, 2, 0)[None],
        size=(H, W), mode="bilinear",
    )[0].transpose(2, 0, 1)
    inst = instance_inference(jnp.asarray(cls), up, Q)

    np.testing.assert_allclose(
        fused["scores"], np.asarray(inst["scores"]), atol=1e-3, rtol=1e-3
    )
    # boxes must hug the positive blob, not the zero region
    np.testing.assert_allclose(fused["boxes"], np.asarray(inst["boxes"]), atol=1.0)
    ref_box = np.asarray(inst["boxes"][0])
    assert ref_box[2] - ref_box[0] < W / 2, ref_box  # sanity: blob, not full width
