"""Full multi-task training step (pjit over the device mesh).

Functional equivalent of the reference's trainer stack (tools/trainers/
trainer.py:92-173 + trainer_base.py:207-246): AdamW with 0.1x backbone LR,
no weight decay on norms/biases/embeddings, full-model gradient clipping at
0.01, WarmupPolyLR schedule; one step consumes a balanced segmentation +
sequence batch (the BalancedSampler 1:1 interleave,
model/utils/data_sampler.py) and optimizes

  L = L_set(criterion: CE + point mask BCE + dice, deep supervision,
            contrastive query<->text) + L_monodepth(7-term self-supervised).

Distribution: gradients are averaged over the mesh's `data` axis by pjit
(XLA all-reduce over ICI — the DDP equivalent); the `model` axis carries the
tensor-parallel shards of the big FFN kernels (parallel/mesh.py rules).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..config import Config
from ..models.oneformer import UniEncoder
from ..models.text_transformer import TextTransformer
from .criterion import SetCriterion
from .monodepth import monodepth_loss


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    text_params: Any
    opt_state: Any


def _decay_mask(params):
    def mask(path, x):
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if x.ndim <= 1:
            return False  # biases, norm scales, 1-d embeds
        if "embed" in name and "patch" not in name and x.ndim == 2:
            return False  # query/level/position embedding tables
        return True

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [mask(p, x) for p, x in flat[0]]
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(params), leaves)


def _lr_label(params):
    def label(path, x):
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        return "backbone" if "backbone" in name else "main"

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [label(p, x) for p, x in flat[0]]
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(params), leaves)


def make_optimizer(
    params,
    base_lr: float = 1e-4,
    weight_decay: float = 0.05,
    backbone_multiplier: float = 0.1,
    clip_value: float = 0.01,
    max_iter: int = 90000,
    poly_power: float = 0.9,
):
    def schedule_for(mult):
        def schedule(step):
            return base_lr * mult * (1.0 - jnp.minimum(step, max_iter) / max_iter) ** poly_power

        return schedule

    def adamw(mult):
        return optax.adamw(
            schedule_for(mult), b1=0.9, b2=0.999, weight_decay=weight_decay,
            mask=_decay_mask,
        )

    tx = optax.chain(
        optax.clip_by_global_norm(clip_value),
        optax.multi_transform(
            {"main": adamw(1.0), "backbone": adamw(backbone_multiplier)}, _lr_label
        ),
    )
    return tx


class Trainer:
    """Builds model + text encoder + criterion and exposes a jit-able
    train_step(state, batch, rng) -> (state, metrics)."""

    def __init__(self, cfg: Config, axis_name: Optional[str] = "data"):
        model_cfg = cfg.model
        if not model_cfg.is_train:
            import dataclasses

            model_cfg = dataclasses.replace(model_cfg, is_train=True)
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.model = UniEncoder(model_cfg)
        te = model_cfg.text_encoder
        self.text_encoder = TextTransformer(
            context_length=te.context_length,
            width=te.width,
            layers=te.num_layers,
            vocab_size=te.vocab_size,
        )
        of = model_cfg.one_former
        self.criterion = SetCriterion(
            num_classes=model_cfg.sem_seg_head.num_classes,
            class_weight=of.class_weight,
            mask_weight=of.mask_weight,
            dice_weight=of.dice_weight,
            no_object_weight=of.no_object_weight,
            contrastive_weight=of.contrastive_weight,
            contrastive_temperature=of.contrastive_temperature,
            num_points=of.train_num_points,
            oversample_ratio=of.oversample_ratio,
            importance_sample_ratio=of.importance_sample_ratio,
            deep_supervision=of.deep_supervision,
            axis_name=None,  # pjit averages grads; num_masks stays per-shard
        )

    # -------------------------------------------------------------- init
    def init(self, rng, seg_batch, seq_batch) -> TrainState:
        r1, r2, r3 = jax.random.split(rng, 3)
        variables = self.model.init(r1, seg_batch["images"], seg_batch["task_tokens"])
        # sequence-path params (pose/motion/depth decoders) come from a
        # second init on the training sequence method; merge the trees.
        v_seq = self.model.init(
            r2,
            seq_batch["images"],
            seq_batch["prev_images"],
            seq_batch["next_images"],
            method=UniEncoder.forward_sequence_train,
        )
        params = _merge_trees(variables.get("params", {}), v_seq.get("params", {}))
        batch_stats = _merge_trees(
            variables.get("batch_stats", {}), v_seq.get("batch_stats", {})
        )
        text_params = self.text_encoder.init(r3, seg_batch["text_tokens"])["params"]
        tx = self._tx = make_optimizer(
            (params, text_params),
            base_lr=self.cfg.solver.base_lr,
            weight_decay=self.cfg.solver.weight_decay,
            backbone_multiplier=self.cfg.solver.backbone_multiplier,
            clip_value=self.cfg.solver.clip_gradients_value,
            max_iter=self.cfg.solver.max_iter,
        )
        opt_state = tx.init((params, text_params))
        return TrainState(jnp.zeros((), jnp.int32), params, batch_stats, text_params, opt_state)

    # -------------------------------------------------------------- step
    def train_step(self, state: TrainState, seg_batch: Dict, seq_batch: Dict, rng) -> Tuple[TrainState, Dict]:
        def loss_fn(trainable):
            params, text_params = trainable
            variables = {"params": params, "batch_stats": state.batch_stats}
            seg_out, seg_mut = self.model.apply(
                variables, seg_batch["images"], seg_batch["task_tokens"],
                mutable=["batch_stats"],
            )
            text_feats = self.text_encoder.apply({"params": text_params}, seg_batch["text_tokens"])
            seg_targets = {
                "labels": seg_batch["labels"],
                "masks": seg_batch["masks"],
                "valid": seg_batch["valid"],
                "text_feats": text_feats,
            }
            r_seg, r_seq = jax.random.split(rng)
            seg_losses = self.criterion(r_seg, seg_out, seg_targets)

            seq_out, seq_mut = self.model.apply(
                variables,
                seq_batch["images"],
                seq_batch["prev_images"],
                seq_batch["next_images"],
                method=UniEncoder.forward_sequence_train,
                mutable=["batch_stats"],
            )
            seq_targets = {
                "color": {
                    0: seq_batch["images"],
                    -1: seq_batch["prev_images"],
                    1: seq_batch["next_images"],
                },
                "K": seq_batch["K"],
                "inv_K": seq_batch["inv_K"],
            }
            seq_losses = monodepth_loss(r_seq, seq_out, seq_targets, state.step)

            total = seg_losses["loss_total"] + seq_losses["loss_monodepth"]
            metrics = {
                "loss": total,
                "loss_seg": seg_losses["loss_total"],
                "loss_monodepth": seq_losses["loss_monodepth"],
                "loss_ce": seg_losses["loss_ce"],
                "loss_mask": seg_losses["loss_mask"],
                "loss_dice": seg_losses["loss_dice"],
            }
            new_bstats = _merge_trees(
                seq_mut.get("batch_stats", {}), seg_mut.get("batch_stats", {})
            )
            return total, (metrics, new_bstats)

        grads, (metrics, new_bstats) = jax.grad(loss_fn, has_aux=True)(
            (state.params, state.text_params)
        )
        updates, opt_state = self._tx.update(
            grads, state.opt_state, (state.params, state.text_params)
        )
        params, text_params = optax.apply_updates((state.params, state.text_params), updates)
        bstats = new_bstats if new_bstats else state.batch_stats
        new_state = TrainState(state.step + 1, params, bstats, text_params, opt_state)
        return new_state, metrics


def _merge_trees(a, b):
    if isinstance(a, (dict, FrozenDict)) and isinstance(b, (dict, FrozenDict)):
        out = dict(a)
        for k, v in b.items():
            out[k] = _merge_trees(out[k], v) if k in out else v
        return out
    return a
