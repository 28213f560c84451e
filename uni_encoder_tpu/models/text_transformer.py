"""CLIP-style causal text encoder for the query-text contrastive branch.

Capability spec: reference model/modeling/transformer_decoder/
text_transformer.py (TextTransformer :207-256, ResidualAttentionBlock :158):
token embedding + learned positions, N pre-norm residual attention blocks
with a causal mask and QuickGELU MLP, final LayerNorm, features taken at the
EOT position (argmax of token ids). Training-only — the release sets
text_encoder=None at inference (oneformer_model.py:147-149) and this module
is likewise only wired into the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import MLP, MultiheadAttention


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    d_model: int
    n_head: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        y = MultiheadAttention(self.d_model, self.n_head, name="attn")(y, y, y, attn_mask=causal_mask)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(4 * self.d_model, name="c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.d_model, name="c_proj")(y)
        return x + y


class TextTransformer(nn.Module):
    context_length: int = 77
    width: int = 256
    layers: int = 6
    vocab_size: int = 49408

    @nn.compact
    def __call__(self, text: jnp.ndarray) -> jnp.ndarray:
        """text: (B, L) int token ids -> (B, width) EOT features."""
        B, L = text.shape
        tok = nn.Embed(self.vocab_size, self.width, name="token_embedding")(text)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01), (self.context_length, self.width))
        x = tok + pos[None, :L]
        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
        heads = max(1, self.width // 64)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, heads, name=f"resblock_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(text, axis=-1)
        return x[jnp.arange(B), eot]


class TextProjector(nn.Module):
    """PROJ_NUM_LAYERS(2)-layer MLP projecting text features to hidden_dim."""

    hidden_dim: int = 256
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        return MLP(self.hidden_dim, self.hidden_dim, self.num_layers, name="proj")(x)


class _SeparateQKVAttention(nn.Module):
    """Attention with separate q/k/v projections (text_transformer.py:32-65)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v):
        H = self.num_heads
        Dh = self.dim // H
        B, N, _ = q.shape
        M = k.shape[1]
        q = nn.Dense(self.dim, use_bias=False, name="q_proj")(q).reshape(B, N, H, Dh)
        k = nn.Dense(self.dim, use_bias=False, name="k_proj")(k).reshape(B, M, H, Dh)
        v = nn.Dense(self.dim, use_bias=False, name="v_proj")(v).reshape(B, M, H, Dh)
        attn = jnp.einsum("bnkc,bmkc->bknm", q, k) * (Dh ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        x = jnp.einsum("bknm,bmkc->bnkc", attn, v).reshape(B, N, self.dim)
        return nn.Dense(self.dim, name="proj")(x)


class ContextDecoder(nn.Module):
    """Text-to-visual context decoder (text_transformer.py:99-149): pre-norm
    self + cross attention layers contextualizing text embeddings with
    projected visual features. Training-only (prompt_ctx is None at
    inference, oneformer_model.py:147-149)."""

    transformer_width: int = 256
    transformer_heads: int = 4
    transformer_layers: int = 6
    visual_dim: int = 1024

    @nn.compact
    def __call__(self, text: jnp.ndarray, visual: jnp.ndarray) -> jnp.ndarray:
        W = self.transformer_width
        mem = nn.LayerNorm(epsilon=1e-5, name="memory_norm1")(visual)
        mem = nn.Dense(W, name="memory_proj")(mem)
        mem = nn.LayerNorm(epsilon=1e-5, name="memory_norm2")(mem)
        x = nn.LayerNorm(epsilon=1e-5, name="text_norm")(text)
        x = nn.Dense(W, name="text_proj")(x)
        for i in range(self.transformer_layers):
            pre = nn.LayerNorm(epsilon=1e-5, name=f"layer{i}_norm1")(x)
            x = x + _SeparateQKVAttention(W, self.transformer_heads, name=f"layer{i}_self_attn")(pre, pre, pre)
            q = nn.LayerNorm(epsilon=1e-5, name=f"layer{i}_norm2")(x)
            x = x + _SeparateQKVAttention(W, self.transformer_heads, name=f"layer{i}_cross_attn")(q, mem, mem)
            y = nn.LayerNorm(epsilon=1e-5, name=f"layer{i}_norm3")(x)
            y = nn.Dense(4 * W, name=f"layer{i}_mlp_fc1")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dense(W, name=f"layer{i}_mlp_fc2")(y)
            x = x + y
        out = nn.LayerNorm(epsilon=1e-5, name="out_norm")(x)
        return nn.Dense(self.visual_dim, name="out_proj")(out)
