"""2-D sine/cosine positional embedding (PositionEmbeddingSine equivalent).

Behavioral spec: reference model/modeling/transformer_decoder/
position_encoding.py:15-55 with normalize=True — y/x embeds are 1-based
cumsums normalized by the last row/col (+eps) and scaled by 2*pi; channel
layout is [pos_y || pos_x], each half interleaving sin/cos over pairs of
equal frequencies.

Here it is a pure function of the static (H, W) — the reference's mask input
is always None at inference — returning NHWC-friendly (H, W, C).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _cached(h: int, w: int, num_pos_feats: int, temperature: int, normalize: bool):
    import numpy as np

    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    if normalize:
        eps = 1e-6
        scale = 2 * math.pi
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave: even channel -> sin, odd channel -> cos (equal freqs pairwise)
    pos_x = np.stack((np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])), axis=3).reshape(h, w, -1)
    pos_y = np.stack((np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])), axis=3).reshape(h, w, -1)
    pos = np.concatenate((pos_y, pos_x), axis=2)
    return pos


def position_embedding_sine(
    h: int, w: int, num_pos_feats: int = 128, temperature: int = 10000, normalize: bool = True
) -> jnp.ndarray:
    """Returns (H, W, 2*num_pos_feats) float32 positional embedding."""
    return jnp.asarray(_cached(int(h), int(w), int(num_pos_feats), int(temperature), bool(normalize)))
