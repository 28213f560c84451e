"""DiNAT backbone (dilated neighborhood attention).

Capability spec: reference model/modeling/backbone/dinat.py (D2DiNAT,
:230-296): ConvTokenizer (two stride-2 3x3 convs + LN), 4 levels of NAT
layers with per-block dilation schedules, ConvDownsampler (3x3 stride-2
conv + LN), per-output LayerNorm; emits {res2..res5}, size_divisibility 32.
The NATTEN CUDA dependency is replaced by
ops.neighborhood_attention.neighborhood_attention_2d.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .. import BACKBONES
from ...ops.neighborhood_attention import neighborhood_attention_2d
from ..layers import gelu, drop_path


class NeighborhoodAttention2D(nn.Module):
    dim: int
    num_heads: int
    kernel_size: int = 7
    dilation: int = 1
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        nh = self.num_heads
        dh = C // nh
        scale = dh ** -0.5
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B, H, W, 3, nh, dh)
        q, k, v = qkv[..., 0, :, :] * scale, qkv[..., 1, :, :], qkv[..., 2, :, :]
        rpb = self.param(
            "rpb",
            nn.initializers.truncated_normal(0.02),
            (nh, 2 * self.kernel_size - 1, 2 * self.kernel_size - 1),
        )
        out = neighborhood_attention_2d(q, k, v, rpb, self.kernel_size, self.dilation)
        out = out.reshape(B, H, W, C)
        return nn.Dense(C, name="proj")(out)


class NATLayer(nn.Module):
    dim: int
    num_heads: int
    kernel_size: int = 7
    dilation: int = 1
    mlp_ratio: float = 3.0
    drop_path_rate: float = 0.0
    deterministic: bool = True

    def _drop_path(self, z):
        if self.deterministic or self.drop_path_rate == 0.0:
            return z
        return drop_path(z, self.drop_path_rate, False, self.make_rng("drop_path"))

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        y = NeighborhoodAttention2D(
            self.dim, self.num_heads, self.kernel_size, self.dilation, name="attn"
        )(y)
        x = x + self._drop_path(y)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = gelu(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + self._drop_path(y)


@BACKBONES.register(name="dinat")
class DiNAT(nn.Module):
    embed_dim: int = 64
    depths: Sequence[int] = (3, 4, 18, 5)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    kernel_size: int = 7
    dilations: Optional[Tuple[Tuple[int, ...], ...]] = None
    mlp_ratio: float = 3.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0
    deterministic: bool = True

    @property
    def out_channels(self):
        return {f"res{i+2}": int(self.embed_dim * 2 ** i) for i in self.out_indices}

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict:
        # ConvTokenizer: two stride-2 convs -> stride 4
        x = nn.Conv(self.embed_dim // 2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], name="tokenizer_conv0")(x)
        x = nn.Conv(self.embed_dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], name="tokenizer_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="tokenizer_norm")(x)

        outs = {}
        import numpy as np

        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        blk = 0
        for i, depth in enumerate(self.depths):
            dim = int(self.embed_dim * 2 ** i)
            for j in range(depth):
                dil = 1 if self.dilations is None else self.dilations[i][j]
                x = NATLayer(
                    dim=dim,
                    num_heads=self.num_heads[i],
                    kernel_size=self.kernel_size,
                    dilation=dil,
                    mlp_ratio=self.mlp_ratio,
                    drop_path_rate=float(dpr[blk]),
                    deterministic=self.deterministic,
                    name=f"levels_{i}_blocks_{j}",
                )(x)
                blk += 1
            if i in self.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{i}")(x)
                outs[f"res{i+2}"] = out
            if i < len(self.depths) - 1:
                x = nn.Conv(2 * dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False, name=f"downsample_{i}_reduction")(x)
                x = nn.LayerNorm(epsilon=1e-5, name=f"downsample_{i}_norm")(x)
        return outs
