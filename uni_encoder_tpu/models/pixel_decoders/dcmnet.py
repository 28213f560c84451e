"""DCMNet (UPerNet-style PSP+FPN) disparity decoder.

Capability spec: reference model/modeling/pixel_decoder/dcmnet.py
(DCMNet, :88-248): PPM over res5 (adaptive pools 1/2/3/6 -> 1x1 conv-BN-relu
-> bilinear resize) + bottleneck, FPN lateral/top-down fusion, per-scale
fpn_bottleneck over upsampled concatenations, 1x1 sigmoid disparity heads
at 4 scales. The mmcv ConvModule (conv + SyncBN + ReLU) maps to
conv + FrozenBatchNorm + relu (stored stats at inference).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import PIXEL_DECODERS
from ...ops import interpolate
from ..layers import FrozenBatchNorm, relu


def adaptive_avg_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d((out, out)) on NHWC."""
    B, H, W, C = x.shape
    rows = []
    for i in range(out):
        h0, h1 = (i * H) // out, -(-((i + 1) * H) // out)
        cols = []
        for j in range(out):
            w0, w1 = (j * W) // out, -(-((j + 1) * W) // out)
            cols.append(x[:, h0:h1, w0:w1].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, out, out, C)


class ConvModule(nn.Module):
    features: int
    kernel: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding=pad, use_bias=False, name="conv")(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        return relu(x)


@PIXEL_DECODERS.register(name="DCMNet")
class DCMNet(nn.Module):
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    channels: int = 512
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        inputs = [features[f] for f in self.in_features]
        C = self.channels

        # PSP over the last level
        x = inputs[-1]
        psp_outs = [x]
        for si, s in enumerate(self.pool_scales):
            p = adaptive_avg_pool(x, s)
            p = ConvModule(C, 1, name=f"psp_{si}")(p)
            p = interpolate(p, size=x.shape[1:3], mode="bilinear", align_corners=False)
            psp_outs.append(p)
        psp = ConvModule(C, 3, name="bottleneck")(jnp.concatenate(psp_outs, axis=-1))

        laterals = [
            ConvModule(C, 1, name=f"lateral_{i}")(inputs[i]) for i in range(len(inputs) - 1)
        ]
        laterals.append(psp)

        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + interpolate(
                laterals[i], size=laterals[i - 1].shape[1:3], mode="bilinear", align_corners=False
            )

        fpn_outs = [ConvModule(C, 3, name=f"fpn_{i}")(laterals[i]) for i in range(len(laterals) - 1)]
        fpn_outs.append(laterals[-1])

        outputs = {}
        for scale in range(3, -1, -1):
            temp = fpn_outs[scale:]
            h, w = temp[0].shape[1:3]
            h, w = 2 * h, 2 * w
            temp = [
                interpolate(t, size=(h, w), mode="bilinear", align_corners=False) for t in temp
            ]
            out = ConvModule(C, 3, name=f"fpn_bottleneck_{scale}")(jnp.concatenate(temp, axis=-1))
            out = nn.Conv(1, (1, 1), name=f"last_layer_{scale}")(out)
            outputs[("disp", scale)] = jax.nn.sigmoid(out)
        return outputs
