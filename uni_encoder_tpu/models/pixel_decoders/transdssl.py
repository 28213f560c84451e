"""TransDSSL depth decoder (production depth decoder).

Capability spec: reference model/modeling/pixel_decoder/transdssl.py —
DPT-like: 1x1 projections of {res2..res5} (Swin-T channels), attention-gated
refinenet fusion blocks with residual conv units (align_corners=True
upsampling), SoftAttDepth soft-argmax disparity heads over 32 bins in
[0.01, 1.0]; outputs {("disp", s): (B,H,W,1)} for s in 0..3 (:370-405).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import PIXEL_DECODERS
from ...ops import interpolate
from ..layers import relu


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(out)
        out = relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """transdssl.py:222-306 (layer_norm=False, expand=False, scale=1)."""

    features: int
    input_length: int = 2

    @nn.compact
    def __call__(self, *xs):
        df = xs[0]
        if len(xs) == 2:
            res = df + xs[1]
            r1 = ResidualConvUnit(self.features, name="resConfUnit1")(xs[1])
            att = jax.nn.softmax(
                nn.Conv(self.features, (1, 1), name="en_atten")(r1), axis=-1
            )
            out = res * att
            output = ResidualConvUnit(self.features, name="resConfUnit2")(out) + res
        else:
            output = ResidualConvUnit(self.features, name="resConfUnit2")(df)
        output = interpolate(output, scale_factor=2, mode="bilinear", align_corners=True)
        output = nn.Conv(self.features, (1, 1), name="out_conv")(output)
        return output


def soft_att_depth(x: jnp.ndarray, alpha: float = 0.01, beta: float = 1.0) -> jnp.ndarray:
    """Soft-argmax over depth bins: softmax over channel bins weighted by a
    linspace(alpha, beta) grid (transdssl.py:187-219). x: (B,H,W,D) -> (B,H,W,1)."""
    d = x.shape[-1]
    grid = jnp.linspace(alpha, beta, d, dtype=jnp.float32)
    z = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
    return jnp.sum(z * grid, axis=-1, keepdims=True).astype(x.dtype)


@PIXEL_DECODERS.register(name="TransDSSL")
class TransDSSL(nn.Module):
    features: int = 256
    n_bins: int = 32
    # scales to emit (reference: 4). The refinement path always runs in
    # full; n_scales < 4 only drops the coarse disp heads (used by the
    # multichip dryrun's micro config via ModelConfig.num_depth_scales).
    n_scales: int = 4

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        F = self.features

        def out_head(x, name):
            x = nn.Conv(F // 2, (3, 3), padding=1, name=f"{name}_0")(x)
            x = nn.Conv(self.n_bins, (3, 3), padding=1, name=f"{name}_1")(x)
            return soft_att_depth(x)

        l1 = nn.Conv(F, (1, 1), use_bias=False, name="layer1_rn")(features["res2"])
        l2 = nn.Conv(F, (1, 1), use_bias=False, name="layer2_rn")(features["res3"])
        l3 = nn.Conv(F, (1, 1), use_bias=False, name="layer3_rn")(features["res4"])
        l4 = nn.Conv(F, (1, 1), use_bias=False, name="layer4_rn")(features["res5"])

        outs = {}
        path4 = FeatureFusionBlock(F, input_length=1, name="refinenet4")(l4)
        path3 = FeatureFusionBlock(F, name="refinenet3")(path4, l3)
        if self.n_scales > 3:
            outs[("disp", 3)] = out_head(path3, "output_conv4")
        path2 = FeatureFusionBlock(F, name="refinenet2")(path3, l2)
        if self.n_scales > 2:
            outs[("disp", 2)] = out_head(path2, "output_conv3")
        path1 = FeatureFusionBlock(F, name="refinenet1")(path2, l1)
        if self.n_scales > 1:
            outs[("disp", 1)] = out_head(path1, "output_conv2")
        l0 = interpolate(l1, scale_factor=2, mode="bilinear", align_corners=True)
        path0 = FeatureFusionBlock(F, name="refinenet0")(path1, l0)
        outs[("disp", 0)] = out_head(path0, "output_conv")
        return outs
