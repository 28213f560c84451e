"""Set criterion for the mask-classification head (training).

The reference release ships no live criterion (SURVEY.md §0) — its matcher
(model/modeling/matcher.py) and loss-weight config (CLASS_WEIGHT 2.0,
MASK_WEIGHT 5.0, DICE_WEIGHT 5.0, NO_OBJECT_WEIGHT 0.1, CONTRASTIVE_WEIGHT
0.5 @ temperature 0.07, DEEP_SUPERVISION, TRAIN_NUM_POINTS 12544,
OVERSAMPLE_RATIO 3.0, IMPORTANCE_SAMPLE_RATIO 0.75;
configs/cityscapes/oneformer_R50_bs16_90k.yaml:23-31,56) define the
contract. This implements the standard OneFormer/Mask2Former criterion those
knobs parameterize: Hungarian-matched CE + point-sampled mask BCE + dice
with uncertainty-based importance sampling, deep supervision over aux
outputs, and a query-text InfoNCE contrastive term.

Everything is fixed-shape: targets are padded to N slots with a validity
mask; invalid slots contribute zero loss; num_masks is psum'd across the
data mesh axis when inside pjit (cross-replica normalization, mirroring the
reference's distributed world-size reduction).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .matcher import hungarian_match, point_sample_per_mask


def _dice_loss(pred_pts, tgt_pts):
    prob = jax.nn.sigmoid(pred_pts)
    num = 2.0 * (prob * tgt_pts).sum(-1)
    den = prob.sum(-1) + tgt_pts.sum(-1)
    return 1.0 - (num + 1.0) / (den + 1.0)


def _bce_loss(pred_pts, tgt_pts):
    return (jax.nn.softplus(-pred_pts) * tgt_pts + jax.nn.softplus(pred_pts) * (1 - tgt_pts)).mean(-1)


def uncertainty_points(rng, mask_logits, num_points, oversample=3.0, importance=0.75):
    """d2 get_uncertain_point_coords_with_randomness: oversample random
    points, keep the most uncertain (smallest |logit|) importance fraction,
    fill the rest uniformly. mask_logits: (M, H, W) -> (M, P, 2)."""
    M = mask_logits.shape[0]
    n_sampled = int(num_points * oversample)
    n_uncertain = int(importance * num_points)
    n_random = num_points - n_uncertain
    r1, r2 = jax.random.split(rng)
    pts = jax.random.uniform(r1, (M, n_sampled, 2))
    logits = point_sample_per_mask(mask_logits, pts)  # (M, n_sampled)
    scores = -jnp.abs(logits)
    _, idx = jax.lax.top_k(scores, n_uncertain)
    top = jnp.take_along_axis(pts, idx[..., None], axis=1)
    rand = jax.random.uniform(r2, (M, n_random, 2))
    return jnp.concatenate([top, rand], axis=1)


def _psum_if_sharded(x, axis_name):
    if axis_name is None:
        return x
    try:
        return jax.lax.psum(x, axis_name)
    except NameError:
        return x


class SetCriterion:
    def __init__(
        self,
        num_classes: int,
        class_weight: float = 2.0,
        mask_weight: float = 5.0,
        dice_weight: float = 5.0,
        no_object_weight: float = 0.1,
        contrastive_weight: float = 0.5,
        contrastive_temperature: float = 0.07,
        num_points: int = 12544,
        oversample_ratio: float = 3.0,
        importance_sample_ratio: float = 0.75,
        deep_supervision: bool = True,
        axis_name: Optional[str] = None,
    ):
        self.num_classes = num_classes
        self.class_weight = class_weight
        self.mask_weight = mask_weight
        self.dice_weight = dice_weight
        self.no_object_weight = no_object_weight
        self.contrastive_weight = contrastive_weight
        self.tau = contrastive_temperature
        self.num_points = num_points
        self.oversample_ratio = oversample_ratio
        self.importance_sample_ratio = importance_sample_ratio
        self.deep_supervision = deep_supervision
        self.axis_name = axis_name

    # ------------------------------------------------------------------ losses
    def _labels_loss(self, pred_logits, tgt_labels, q_for_t, tgt_valid):
        """Weighted CE with empty-class weight no_object_weight."""
        B, Q, Kp1 = pred_logits.shape
        K = self.num_classes
        # scatter matched target labels onto queries; default = no-object K
        target_q = jnp.full((B, Q), K, jnp.int32)
        b_idx = jnp.arange(B)[:, None]
        safe_q = jnp.clip(q_for_t, 0, Q - 1)
        scatter_lbl = jnp.where(tgt_valid, tgt_labels, K)
        target_q = target_q.at[b_idx, safe_q].set(
            jnp.where(tgt_valid, scatter_lbl, target_q[b_idx, safe_q])
        )
        logp = jax.nn.log_softmax(pred_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target_q[..., None], axis=-1)[..., 0]
        w = jnp.where(target_q == K, self.no_object_weight, 1.0)
        return (w * nll).sum() / w.sum()  # torch CE 'mean' with class weights

    def _masks_loss(self, rng, pred_masks, tgt_masks, q_for_t, tgt_valid, num_masks):
        B, Q, H, W = pred_masks.shape
        N = tgt_masks.shape[1]
        b_idx = jnp.arange(B)[:, None]
        matched_pred = pred_masks[b_idx, jnp.clip(q_for_t, 0, Q - 1)]  # (B, N, H, W)
        mp = matched_pred.reshape(B * N, H, W)
        mt = tgt_masks.reshape(B * N, *tgt_masks.shape[2:]).astype(jnp.float32)
        valid = tgt_valid.reshape(B * N)

        pts = uncertainty_points(
            rng, jax.lax.stop_gradient(mp), self.num_points,
            self.oversample_ratio, self.importance_sample_ratio,
        )
        pred_pts = point_sample_per_mask(mp, pts)
        tgt_pts = jax.lax.stop_gradient(point_sample_per_mask(mt, pts))

        bce = (_bce_loss(pred_pts, tgt_pts) * valid).sum() / num_masks
        dice = (_dice_loss(pred_pts, tgt_pts) * valid).sum() / num_masks
        return bce, dice

    def contrastive_loss(self, query_feats, text_feats, logit_scale=None):
        """Bidirectional InfoNCE between per-image query features and text
        features (the OneFormer criterion structure): inputs of shape
        (B, Q, C) / (B, N_text, C) are FLATTENED per image (queries aligned
        with the per-query text list, reference encode_text +
        dataset-mapper text padding), L2-normalized, and contrasted across
        the batch with a learnable clamped logit scale; (B, C) inputs are
        supported for the pooled variant."""
        q = query_feats.reshape(query_feats.shape[0], -1)
        t = text_feats.reshape(text_feats.shape[0], -1)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
        t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-8)
        if logit_scale is None:
            scale = 1.0 / self.tau
        else:
            scale = jnp.clip(jnp.exp(logit_scale), a_max=100.0)
        logits = q @ t.T * scale
        labels = jnp.arange(q.shape[0])
        l_qt = -jnp.take_along_axis(jax.nn.log_softmax(logits, 1), labels[:, None], 1).mean()
        l_tq = -jnp.take_along_axis(jax.nn.log_softmax(logits, 0).T, labels[:, None], 1).mean()
        return l_qt + l_tq

    # ------------------------------------------------------------------ main
    def __call__(self, rng, outputs: Dict, targets: Dict) -> Dict[str, jnp.ndarray]:
        """targets: {labels (B,N), masks (B,N,H,W), valid (B,N)}; masks at the
        pred_masks resolution (stride 4)."""
        tgt_labels = targets["labels"]
        tgt_masks = targets["masks"]
        tgt_valid = targets["valid"]

        num_masks = jnp.maximum(tgt_valid.sum().astype(jnp.float32), 1.0)
        num_masks = _psum_if_sharded(num_masks, self.axis_name)
        if self.axis_name is not None:
            n_dev = jax.lax.psum(1, self.axis_name)
            num_masks = jnp.maximum(num_masks / n_dev, 1.0)

        losses = {}
        layers = [outputs] + list(outputs.get("aux_outputs", []) if self.deep_supervision else [])
        total = 0.0
        for li, layer_out in enumerate(layers):
            rng, r_match, r_pts = jax.random.split(rng, 3)
            q_for_t, _ = hungarian_match(
                jax.lax.stop_gradient(layer_out["pred_logits"]),
                jax.lax.stop_gradient(layer_out["pred_masks"]),
                tgt_labels, tgt_masks, tgt_valid, r_match,
                num_points=self.num_points,
                cost_class=self.class_weight,
                cost_mask=self.mask_weight,
                cost_dice=self.dice_weight,
            )
            l_ce = self._labels_loss(layer_out["pred_logits"], tgt_labels, q_for_t, tgt_valid)
            l_bce, l_dice = self._masks_loss(
                r_pts, layer_out["pred_masks"], tgt_masks, q_for_t, tgt_valid, num_masks
            )
            tag = "" if li == 0 else f"_{li-1}"
            losses[f"loss_ce{tag}"] = self.class_weight * l_ce
            losses[f"loss_mask{tag}"] = self.mask_weight * l_bce
            losses[f"loss_dice{tag}"] = self.dice_weight * l_dice
            total = total + losses[f"loss_ce{tag}"] + losses[f"loss_mask{tag}"] + losses[f"loss_dice{tag}"]

        if "contrastive_logits" in outputs and "text_feats" in targets and outputs["contrastive_logits"] is not None:
            l_con = self.contrastive_loss(
                outputs["contrastive_logits"],  # (B, Q, C) per-query features
                targets["text_feats"],  # (B, Q, C) per-query texts + prompt ctx
                targets.get("logit_scale"),
            )
            losses["loss_contrastive"] = self.contrastive_weight * l_con
            total = total + losses["loss_contrastive"]

        losses["loss_total"] = total
        return losses
