"""FPN-family pixel decoders.

Capability spec: reference model/modeling/pixel_decoder/fpn.py —
  * BasePixelDecoder (:39-161): top-down FPN (lateral 1x1 + output 3x3
    convs, nearest upsample), mask features via a 3x3 conv on the final
    high-res map, multi-scale features = the 3 lowest-res outputs;
  * TransformerEncoderPixelDecoder (:206-315): same FPN but the lowest-res
    feature first runs through a 6-layer vanilla transformer encoder
    (post-norm, sine PE); also returns the encoder features;
  * DepthTransformerEncoderPixelDecoder (:318-458): the transformer FPN with
    per-level reflect-conv/GN/ELU/sigmoid disparity heads.

Norm is GroupNorm32 (config NORM: "GN") — conv bias off, like d2's Conv2d
with a norm.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import PIXEL_DECODERS
from ...ops import interpolate, position_embedding_sine
from ..layers import Conv, MultiheadAttention, elu, relu


def _gn(name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)


class TransformerEncoderLayerPost(nn.Module):
    """Post-norm transformer encoder layer (transformer.py:161-234)."""

    d_model: int
    nheads: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, src, pos):
        q = src + pos
        src2 = MultiheadAttention(self.d_model, self.nheads, name="self_attn")(q, q, src)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + src2)
        src2 = nn.Dense(self.dim_feedforward, name="linear1")(src)
        src2 = nn.Dense(self.d_model, name="linear2")(relu(src2))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + src2)


class _FPNTrunk(nn.Module):
    """Shared top-down pass. Returns (per-level outputs low->high res,
    transformer_encoder_features or None)."""

    conv_dim: int = 256
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    use_transformer: bool = False
    transformer_layers: int = 6
    nheads: int = 8
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        C = self.conv_dim
        outs = []
        enc_feats = None
        y = None
        n = len(self.in_features)
        for idx, f in enumerate(reversed(list(self.in_features))):
            x = features[f]
            layer_num = n - idx  # reference names layers high->low as layer_{n}..layer_1
            if idx == 0:
                if self.use_transformer:
                    t = nn.Conv(C, (1, 1), name="input_proj")(x)
                    h, w = t.shape[1], t.shape[2]
                    pos = position_embedding_sine(h, w, C // 2).reshape(1, h * w, C).astype(t.dtype)
                    t = t.reshape(t.shape[0], h * w, C)
                    for li in range(self.transformer_layers):
                        t = TransformerEncoderLayerPost(
                            C, self.nheads, self.dim_feedforward, name=f"encoder_layer_{li}"
                        )(t, pos)
                    t = t.reshape(t.shape[0], h, w, C)
                    enc_feats = t
                    y = t
                else:
                    y = x
                y = nn.Conv(C, (3, 3), padding=1, use_bias=False, name=f"layer_{layer_num}_conv")(y)
                y = _gn(f"layer_{layer_num}_gn")(y)
                y = relu(y)
            else:
                lat = nn.Conv(C, (1, 1), use_bias=False, name=f"adapter_{layer_num}_conv")(x)
                lat = _gn(f"adapter_{layer_num}_gn")(lat)
                y = lat + interpolate(y, size=lat.shape[1:3], mode="nearest")
                y = nn.Conv(C, (3, 3), padding=1, use_bias=False, name=f"layer_{layer_num}_conv")(y)
                y = _gn(f"layer_{layer_num}_gn")(y)
                y = relu(y)
            outs.append(y)
        return outs, enc_feats


@PIXEL_DECODERS.register(name="BasePixelDecoder")
class BasePixelDecoder(nn.Module):
    conv_dim: int = 256
    mask_dim: int = 256
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    num_multi_scale: int = 3

    @nn.compact
    def __call__(self, features):
        outs, _ = _FPNTrunk(self.conv_dim, self.in_features, name="trunk")(features)
        mask_features = nn.Conv(self.mask_dim, (3, 3), padding=1, name="mask_features")(outs[-1])
        return mask_features, None, outs[: self.num_multi_scale]


@PIXEL_DECODERS.register(name="TransformerEncoderPixelDecoder")
class TransformerEncoderPixelDecoder(nn.Module):
    conv_dim: int = 256
    mask_dim: int = 256
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    transformer_layers: int = 6
    nheads: int = 8
    dim_feedforward: int = 2048
    num_multi_scale: int = 3

    @nn.compact
    def __call__(self, features):
        outs, enc = _FPNTrunk(
            self.conv_dim,
            self.in_features,
            use_transformer=True,
            transformer_layers=self.transformer_layers,
            nheads=self.nheads,
            dim_feedforward=self.dim_feedforward,
            name="trunk",
        )(features)
        mask_features = nn.Conv(self.mask_dim, (3, 3), padding=1, name="mask_features")(outs[-1])
        return mask_features, enc, outs[: self.num_multi_scale]


@PIXEL_DECODERS.register(name="DepthTransformerEncoderPixelDecoder")
class DepthTransformerEncoderPixelDecoder(nn.Module):
    conv_dim: int = 256
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    transformer_layers: int = 6
    nheads: int = 8
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, features):
        outs, _ = _FPNTrunk(
            self.conv_dim,
            self.in_features,
            use_transformer=True,
            transformer_layers=self.transformer_layers,
            nheads=self.nheads,
            dim_feedforward=self.dim_feedforward,
            name="trunk",
        )(features)
        C = self.conv_dim
        disps = {}
        for i, o in enumerate(outs):
            z = Conv(C // 2, (3, 3), padding=1, padding_mode="reflect", name=f"low_disp_{i}_conv0")(o)
            z = _gn(f"low_disp_{i}_gn0")(z)
            z = elu(z)
            z = Conv(C // 2, (3, 3), padding=1, padding_mode="reflect", name=f"low_disp_{i}_conv1")(z)
            z = _gn(f"low_disp_{i}_gn1")(z)
            z = elu(z)
            z = nn.Conv(1, (1, 1), name=f"low_disp_{i}_out")(z)
            disps[("disp", len(outs) - 1 - i)] = jax.nn.sigmoid(z)
        return disps
