"""Task-conditioned multi-scale masked query decoder.

Capability spec: reference model/modeling/transformer_decoder/
oneformer_transformer_decoder.py (ContrastiveMultiScaleMaskedTransformerDecoder,
:226-528) + the DETR-style class transformer (transformer.py:22-82):

  * 150 queries; the last is the task token; the other 149 are seeded by a
    2-layer DETR decoder ("class transformer") whose memory is the sine PE
    of the mask features and whose key pos-embed is the 1x1-projected mask
    features (:432-438 — the src/pos swap is reproduced faithfully).
  * dec_layers-1 = 9 rounds of masked cross-attention -> self-attention ->
    FFN cycling over the 3 low-res feature levels, with the attention mask
    derived from the previous round's predicted masks at the level's
    resolution, thresholded at sigmoid < 0.5; fully-masked rows are
    un-masked (:452-476, 495-513).

TPU optimization (exact, not approximate): the reference computes each
round's masks at stride-4 resolution and bilinearly downsamples them to the
attention level (:500-504). Bilinear resize and the mask einsum are both
linear in mask_features, and they commute — so we pre-resize mask_features
to each level's resolution once and compute attention-mask logits directly
at level resolution, avoiding 10 full-resolution B*Q*H*W einsums +
interpolations per forward. Full-resolution masks are materialized only for
the final prediction (and per-layer when is_train for deep supervision).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import TRANSFORMER_DECODERS
from ..ops import interpolate, position_embedding_sine
from .layers import MLP, MultiheadAttention, relu


class DETRDecoderLayer(nn.Module):
    """Post-norm DETR decoder layer (transformer.py:237-297)."""

    d_model: int
    nheads: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos):
        q = tgt + query_pos
        tgt2 = MultiheadAttention(self.d_model, self.nheads, name="self_attn")(q, q, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + tgt2)
        tgt2 = MultiheadAttention(
            self.d_model, self.nheads, name="multihead_attn"
        )(tgt + query_pos, memory + pos, memory)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + tgt2)
        tgt2 = nn.Dense(self.dim_feedforward, name="linear1")(tgt)
        tgt2 = nn.Dense(self.d_model, name="linear2")(relu(tgt2))
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + tgt2)
        return tgt


class CrossAttentionLayer(nn.Module):
    d_model: int
    nheads: int

    @nn.compact
    def __call__(self, tgt, memory, memory_mask, pos, query_pos):
        tgt2 = MultiheadAttention(self.d_model, self.nheads, name="multihead_attn")(
            tgt + query_pos, memory + pos, memory, attn_mask=memory_mask
        )
        return nn.LayerNorm(epsilon=1e-5, name="norm")(tgt + tgt2)


class SelfAttentionLayer(nn.Module):
    d_model: int
    nheads: int

    @nn.compact
    def __call__(self, tgt, query_pos):
        q = tgt + query_pos
        tgt2 = MultiheadAttention(self.d_model, self.nheads, name="self_attn")(q, q, tgt)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(tgt + tgt2)


class FFNLayer(nn.Module):
    d_model: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, tgt):
        tgt2 = nn.Dense(self.dim_feedforward, name="linear1")(tgt)
        tgt2 = nn.Dense(self.d_model, name="linear2")(relu(tgt2))
        return nn.LayerNorm(epsilon=1e-5, name="norm")(tgt + tgt2)


@TRANSFORMER_DECODERS.register(name="ContrastiveMultiScaleMaskedTransformerDecoder")
class OneFormerQueryDecoder(nn.Module):
    num_classes: int = 19
    hidden_dim: int = 256
    num_queries: int = 150
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9  # cfg DEC_LAYERS - 1
    class_dec_layers: int = 2
    mask_dim: int = 256
    num_feature_levels: int = 3
    use_task_norm: bool = True
    is_train: bool = False

    @nn.compact
    def __call__(
        self,
        multi_scale_features: Sequence[jnp.ndarray],  # low-res -> high-res, (B,h,w,C)
        mask_features: jnp.ndarray,  # (B, H4, W4, mask_dim)
        task_embedding: jnp.ndarray,  # (B, hidden_dim)
    ):
        C = self.hidden_dim
        Q = self.num_queries
        B = mask_features.shape[0]
        L = self.num_feature_levels
        assert len(multi_scale_features) == L

        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (Q, C))
        level_embed = self.param("level_embed", nn.initializers.normal(1.0), (L, C))

        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_embed_mlp = MLP(C, self.mask_dim, 3, name="mask_embed")

        # ---- flatten levels, add level embed + sine PE
        srcs, poss, sizes = [], [], []
        for i in range(L):
            x = multi_scale_features[i]
            h, w = x.shape[1], x.shape[2]
            sizes.append((h, w))
            pe = position_embedding_sine(h, w, C // 2).reshape(1, h * w, C)
            poss.append(pe.astype(x.dtype))
            srcs.append(x.reshape(B, h * w, C) + level_embed[i][None, None])

        # ---- seed queries with the class transformer
        tasks = task_embedding[:, None, :]  # (B, 1, C)
        if self.use_task_norm:
            tasks = decoder_norm(tasks)

        mh, mw = mask_features.shape[1], mask_features.shape[2]
        pe_mask = position_embedding_sine(mh, mw, C // 2).reshape(1, mh * mw, C)
        pe_mask = jnp.broadcast_to(pe_mask, (B, mh * mw, C)).astype(mask_features.dtype)
        proj_mask = nn.Conv(C, (1, 1), name="class_input_proj")(mask_features).reshape(B, mh * mw, C)

        # reference quirk (oneformer_transformer_decoder.py:432-438): the
        # class transformer's memory is the PE map; the projected features
        # ride along as the key pos-embed.
        tgt = jnp.broadcast_to(tasks, (B, Q - 1, C))
        cls_query_pos = jnp.broadcast_to(query_embed[None, : Q - 1], (B, Q - 1, C))
        for i in range(self.class_dec_layers):
            tgt = DETRDecoderLayer(
                C, self.nheads, self.dim_feedforward, name=f"class_dec_{i}",
            )(tgt, pe_mask, proj_mask, cls_query_pos)
        out_t = nn.LayerNorm(epsilon=1e-5, name="class_transformer_norm")(tgt)

        output = jnp.concatenate([out_t, tasks], axis=1)  # (B, Q, C)
        # contrastive logits are the *seeded* queries (reference :440, :479-482)
        initial_queries = output
        query_pos = jnp.broadcast_to(query_embed[None], (B, Q, C))

        # ---- pre-resize mask features to each attention level (linearity of
        # bilinear resize <-> einsum lets us compute attn masks at level res)
        mask_feats_at_level = [
            interpolate(mask_features, size=sizes[i], mode="bilinear", align_corners=False).reshape(
                B, sizes[i][0] * sizes[i][1], self.mask_dim
            )
            for i in range(L)
        ]
        mask_feats_full = mask_features.reshape(B, mh * mw, self.mask_dim)

        def attn_mask_for(output, level):
            dec = decoder_norm(output)
            emb = mask_embed_mlp(dec)  # (B, Q, mask_dim)
            logits_lvl = jnp.einsum(
                "bqc,bnc->bqn", emb, mask_feats_at_level[level],
                preferred_element_type=emb.dtype,  # threshold at logit 0: dtype-exact
            )
            masked = jax.nn.sigmoid(logits_lvl) < 0.5  # True = not allowed
            # un-mask rows that are fully masked (reference :454)
            all_masked = jnp.all(masked, axis=-1, keepdims=True)
            masked = jnp.where(all_masked, False, masked)
            # broadcast over heads: (B, 1, Q, N)
            return jax.lax.stop_gradient(masked[:, None]), emb

        def full_masks(emb):
            return jnp.einsum(
                "bqc,bnc->bqn", emb, mask_feats_full, preferred_element_type=emb.dtype
            ).reshape(B, Q, mh, mw)

        predictions_class: List[jnp.ndarray] = []
        predictions_mask: List[jnp.ndarray] = []

        attn_mask, emb0 = attn_mask_for(output, 0)
        if self.is_train:
            predictions_class.append(class_embed(decoder_norm(output)))
            predictions_mask.append(full_masks(emb0))

        for i in range(self.dec_layers):
            lvl = i % L
            output = CrossAttentionLayer(C, self.nheads, name=f"cross_attn_{i}")(
                output, srcs[lvl], attn_mask, poss[lvl], query_pos
            )
            output = SelfAttentionLayer(C, self.nheads, name=f"self_attn_{i}")(output, query_pos)
            output = FFNLayer(C, self.dim_feedforward, name=f"ffn_{i}")(output)

            next_lvl = (i + 1) % L
            attn_mask, emb = attn_mask_for(output, next_lvl)
            if self.is_train or i == self.dec_layers - 1:
                predictions_class.append(class_embed(decoder_norm(output)))
                predictions_mask.append(full_masks(emb))

        out = {
            "pred_logits": predictions_class[-1],
            "pred_masks": predictions_mask[-1],  # (B, Q, H4, W4)
        }
        if self.is_train:
            out["aux_outputs"] = [
                {"pred_logits": c, "pred_masks": m}
                for c, m in zip(predictions_class[:-1], predictions_mask[:-1])
            ]
            out["contrastive_logits"] = initial_queries
        return out
