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
        heads = self.width // 64
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
