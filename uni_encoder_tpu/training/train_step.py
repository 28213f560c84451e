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
import numpy as np
import optax
from flax.core import FrozenDict

from ..config import Config
from flax import linen as nn

from ..models.oneformer import UniEncoder
from ..models.text_transformer import TextProjector, TextTransformer
from .criterion import SetCriterion
from .monodepth import monodepth_loss


class _TextEncoder(nn.Module):
    """TextTransformer + TextProjector + learned prompt context + logit
    scale: maps per-query text token lists (B, N_text, L) to (B, N_text +
    n_ctx, hidden_dim) features in the query-decoder embedding space, the
    reference's encode_text structure (oneformer_model.py:193-215: rearrange
    'b n l -> (b n) l', project, append prompt_ctx embeddings). A (B, L)
    input is treated as a single text per image with no context append."""

    context_length: int
    width: int
    layers: int
    vocab_size: int
    hidden_dim: int
    proj_num_layers: int
    n_ctx: int = 16

    @nn.compact
    def __call__(self, text):
        squeeze = text.ndim == 3
        B = text.shape[0]
        if squeeze:
            n = text.shape[1]
            text = text.reshape(B * n, text.shape[2])
        x = TextTransformer(
            context_length=self.context_length,
            width=self.width,
            layers=self.layers,
            vocab_size=self.vocab_size,
            name="text_encoder",
        )(text)
        x = TextProjector(
            hidden_dim=self.hidden_dim,
            num_layers=self.proj_num_layers,
            name="text_projector",
        )(x)
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, float(np.log(1.0 / 0.07))),
            (),
        )
        if squeeze:
            x = x.reshape(B, n, self.hidden_dim)
            ctx = self.param(
                "prompt_ctx", nn.initializers.normal(0.02), (self.n_ctx, self.hidden_dim)
            )
            x = jnp.concatenate([x, jnp.broadcast_to(ctx[None], (B, self.n_ctx, self.hidden_dim))], axis=1)
        return {"texts": x, "logit_scale": logit_scale}


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    text_params: Any
    opt_state: Any


class FusedOptState(NamedTuple):
    count: jnp.ndarray
    mu: Tuple[jnp.ndarray, ...]  # one flat vector per bucket
    nu: Tuple[jnp.ndarray, ...]


# buckets: (main/backbone LR group) x (decay / no-decay)
_N_BUCKETS = 4


def _bucket_index(path, x) -> int:
    name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
    backbone = "backbone" in name
    no_decay = x.ndim <= 1 or ("embed" in name and "patch" not in name and x.ndim == 2)
    return (2 if backbone else 0) + (0 if no_decay else 1)


def _bucketize(tree):
    """Flatten a pytree into _N_BUCKETS contiguous 1-D vectors (+ static
    placement metadata for the inverse)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    pieces = [[] for _ in range(_N_BUCKETS)]
    meta = []  # per leaf: (bucket, offset-within-bucket, shape)
    offsets = [0] * _N_BUCKETS
    for path, x in flat:
        b = _bucket_index(path, x)
        meta.append((b, offsets[b], x.shape))
        offsets[b] += int(np_prod(x.shape))
        pieces[b].append(jnp.ravel(x))
    vecs = tuple(
        jnp.concatenate(p) if p else jnp.zeros((0,), jnp.float32) for p in pieces
    )
    return vecs, meta, treedef


def _unbucketize(vecs, meta, treedef):
    leaves = []
    for b, off, shape in meta:
        n = int(np_prod(shape))
        # offsets are static python ints -> static lax.slice, cheap to compile
        leaves.append(vecs[b][off : off + n].reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def np_prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out


def make_optimizer(
    base_lr: float = 1e-4,
    weight_decay: float = 0.05,
    backbone_multiplier: float = 0.1,
    clip_value: float = 0.01,
    max_iter: int = 90000,
    poly_power: float = 0.9,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """Fused AdamW + global-norm clip + WarmupPolyLR (reference trainer
    semantics: tools/trainers/trainer.py:92-173 — 0.1x backbone LR, no decay
    on norms/biases/embeddings, full-model clip).

    TPU-native formulation: instead of per-leaf optax ops (~25 HLO ops per
    parameter leaf — ~10k ops for this model, which dominates XLA compile
    time and kernel-launch overhead), every leaf is packed into one of four
    contiguous vectors keyed by (LR group x decay group) and the whole update
    is a handful of large fused elementwise kernels. Mathematically identical
    to optax.chain(clip_by_global_norm, multi_transform(adamw)) because Adam
    and weight decay are elementwise and the hyperparameters are constant
    within a bucket.
    """
    # per-bucket hyperparameters, indexed by _bucket_index
    mults = (1.0, 1.0, backbone_multiplier, backbone_multiplier)
    decays = (0.0, weight_decay, 0.0, weight_decay)

    def lr_at(step):
        return base_lr * (1.0 - jnp.minimum(step, max_iter) / max_iter) ** poly_power

    def init(params):
        vecs, _, _ = _bucketize(params)
        zeros = tuple(jnp.zeros_like(v) for v in vecs)
        return FusedOptState(jnp.zeros((), jnp.int32), zeros, zeros)

    def update(grads, state: FusedOptState, params):
        g_vecs, meta, treedef = _bucketize(grads)
        p_vecs, _, _ = _bucketize(params)

        # global-norm clip over ALL buckets (optax.clip_by_global_norm)
        gnorm = jnp.sqrt(sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in g_vecs))
        scale = jnp.where(gnorm < clip_value, 1.0, clip_value / (gnorm + 1e-16))
        g_vecs = tuple(v * scale for v in g_vecs)

        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = lr_at(state.count)

        new_mu, new_nu, upd_vecs = [], [], []
        for i in range(_N_BUCKETS):
            g = g_vecs[i]
            mu = b1 * state.mu[i] + (1.0 - b1) * g
            nu = b2 * state.nu[i] + (1.0 - b2) * g * g
            mhat = mu / c1
            vhat = nu / c2
            step_dir = mhat / (jnp.sqrt(vhat) + eps) + decays[i] * p_vecs[i]
            upd_vecs.append(-lr * mults[i] * step_dir)
            new_mu.append(mu)
            new_nu.append(nu)

        updates = _unbucketize(tuple(upd_vecs), meta, treedef)
        return updates, FusedOptState(count, tuple(new_mu), tuple(new_nu))

    return optax.GradientTransformation(init, update)


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
        self.text_encoder = _TextEncoder(
            context_length=te.context_length,
            width=te.width,
            layers=te.num_layers,
            vocab_size=te.vocab_size,
            hidden_dim=model_cfg.one_former.hidden_dim,
            proj_num_layers=te.proj_num_layers,
            n_ctx=te.n_ctx,
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
        # optimizer only depends on solver config, so build it here — a
        # restored TrainState can call train_step without going through init()
        self._tx = make_optimizer(
            base_lr=cfg.solver.base_lr,
            weight_decay=cfg.solver.weight_decay,
            backbone_multiplier=cfg.solver.backbone_multiplier,
            clip_value=cfg.solver.clip_gradients_value,
            max_iter=cfg.solver.max_iter,
        )

    # -------------------------------------------------------------- init
    def init(self, rng, seg_batch, seq_batch) -> TrainState:
        r1, r2, r3, r_dp = jax.random.split(rng, 4)
        variables = self.model.init(
            {"params": r1, "drop_path": r_dp},
            seg_batch["images"], seg_batch["task_tokens"],
        )
        # sequence-path params (pose/motion/depth decoders) come from a
        # second init on the training sequence method; merge the trees.
        v_seq = self.model.init(
            {"params": r2, "drop_path": r_dp},
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
        opt_state = self._tx.init((params, text_params))
        return TrainState(jnp.zeros((), jnp.int32), params, batch_stats, text_params, opt_state)

    # -------------------------------------------------------------- step
    def train_step(self, state: TrainState, seg_batch: Dict, seq_batch: Dict, rng) -> Tuple[TrainState, Dict]:
        rng_dp_seg, rng_dp_seq, rng_losses = jax.random.split(rng, 3)

        def loss_fn(trainable):
            params, text_params = trainable
            variables = {"params": params, "batch_stats": state.batch_stats}
            seg_out, seg_mut = self.model.apply(
                variables, seg_batch["images"], seg_batch["task_tokens"],
                mutable=["batch_stats"], rngs={"drop_path": rng_dp_seg},
            )
            text_out = self.text_encoder.apply({"params": text_params}, seg_batch["text_tokens"])
            seg_targets = {
                "labels": seg_batch["labels"],
                "masks": seg_batch["masks"],
                "valid": seg_batch["valid"],
                "text_feats": text_out["texts"],
                "logit_scale": text_out["logit_scale"],
            }
            r_seg, r_seq = jax.random.split(rng_losses)
            seg_losses = self.criterion(r_seg, seg_out, seg_targets)

            seq_out, seq_mut = self.model.apply(
                variables,
                seq_batch["images"],
                seq_batch["prev_images"],
                seq_batch["next_images"],
                method=UniEncoder.forward_sequence_train,
                mutable=["batch_stats"], rngs={"drop_path": rng_dp_seq},
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
