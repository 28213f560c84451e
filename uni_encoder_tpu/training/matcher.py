"""Hungarian matcher for mask classification training — fully on-device.

Behavioral spec: reference model/modeling/matcher.py (HungarianMatcher,
:93-202): per image, cost = class_weight * (-p_class[target]) +
mask_weight * point-sampled sigmoid-CE + dice_weight * point-sampled dice,
with a NaN/Inf guard, solved by linear sum assignment. The reference runs
scipy on host per image; here the costs are batched tensor ops and the
assignment is optax's jit-compatible Hungarian solver vmapped over the
batch — no host syncs, fixed shapes (invalid target slots are masked with a
large cost and filtered downstream via the validity mask).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops import grid_sample

BIG_COST = 1e8


def point_sample(masks: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Sample (N, H, W) mask logits at (P, 2) normalized [0,1] xy points
    (d2 point_sample semantics: grid_sample(2*p-1, align_corners=False)).
    Returns (N, P)."""
    N, H, W = masks.shape
    grid = jnp.broadcast_to((2.0 * points - 1.0)[None, None], (N, 1, points.shape[0], 2))
    out = grid_sample(masks[..., None], grid, align_corners=False)  # (N, 1, P, 1)
    return out[:, 0, :, 0]


def point_sample_per_mask(masks: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """masks (M, H, W), per-mask points (M, P, 2) -> (M, P)."""
    out = grid_sample(masks[..., None], (2.0 * points - 1.0)[:, None], align_corners=False)
    return out[:, 0, :, 0]


def batch_sigmoid_ce_cost(pred_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    """(Q, P) logits x (N, P) binary -> (Q, N) mean-BCE cost."""
    pos = jax.nn.softplus(-pred_pts)  # -log sigmoid(x)
    neg = jax.nn.softplus(pred_pts)  # -log(1 - sigmoid(x))
    P = pred_pts.shape[-1]
    return (pos @ tgt_pts.T + neg @ (1.0 - tgt_pts).T) / P


def batch_dice_cost(pred_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    prob = jax.nn.sigmoid(pred_pts)
    num = 2.0 * (prob @ tgt_pts.T)
    den = prob.sum(-1)[:, None] + tgt_pts.sum(-1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


def hungarian_match(
    pred_logits: jnp.ndarray,  # (B, Q, K+1)
    pred_masks: jnp.ndarray,  # (B, Q, H, W) logits
    tgt_labels: jnp.ndarray,  # (B, N) int
    tgt_masks: jnp.ndarray,  # (B, N, Ht, Wt) {0,1}
    tgt_valid: jnp.ndarray,  # (B, N) bool
    rng: jax.Array,
    num_points: int = 12544,
    cost_class: float = 2.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (query_for_target (B, N) int32, matched_valid (B, N) bool):
    for each (valid) target slot, the assigned query index."""
    B, Q, _ = pred_logits.shape
    N = tgt_labels.shape[1]

    points = jax.random.uniform(rng, (B, num_points, 2))

    def per_image(logits, masks, labels, tmasks, valid, pts):
        prob = jax.nn.softmax(logits, axis=-1)  # (Q, K+1)
        c_class = -prob[:, labels]  # (Q, N)
        pred_pts = point_sample(masks, pts)  # (Q, P)
        tgt_pts = point_sample(tmasks.astype(jnp.float32), pts)  # (N, P)
        tgt_pts = jax.lax.stop_gradient(tgt_pts)
        c_mask = batch_sigmoid_ce_cost(pred_pts, tgt_pts)
        c_dice = batch_dice_cost(pred_pts, tgt_pts)
        cost = cost_mask * c_mask + cost_class * c_class + cost_dice * c_dice
        cost = jnp.where(jnp.isfinite(cost), cost, BIG_COST)  # NaN guard (matcher.py:184)
        cost = jnp.where(valid[None, :], cost, BIG_COST)
        # optax solves rectangular (N <= Q) assignment minimizing total cost
        i, j = optax.assignment.hungarian_algorithm(cost.T)  # rows = targets
        # i: target indices, j: assigned query per target (aligned with i)
        q_for_t = jnp.zeros((N,), jnp.int32).at[i].set(j.astype(jnp.int32))
        return q_for_t

    q_for_t = jax.vmap(per_image)(pred_logits, pred_masks, tgt_labels, tgt_masks, tgt_valid, points)
    return q_for_t, tgt_valid
