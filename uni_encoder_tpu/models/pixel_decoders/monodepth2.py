"""monodepth2-style U-Net disparity decoder.

Capability spec: reference model/modeling/pixel_decoder/monodepth2.py
(MonodepthDecoder, :61-121): decodes {stem,res2..res5} (channel spec
[64, 64, 128, 256, 512]) through upconv blocks (reflect-pad 3x3 conv + ELU,
nearest x2 upsample, skip concat) emitting sigmoid disparity at 4 scales.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import PIXEL_DECODERS
from ...ops import interpolate
from ..layers import Conv, elu


@PIXEL_DECODERS.register(name="MonodepthDecoder")
class MonodepthDecoder(nn.Module):
    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    scales: Sequence[int] = (0, 1, 2, 3)
    use_skips: bool = True
    in_features: Sequence[str] = ("stem", "res2", "res3", "res4", "res5")

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        feats = [features[f] for f in self.in_features]
        x = feats[-1]
        outputs = {}
        for i in range(4, -1, -1):
            x = Conv(self.num_ch_dec[i], (3, 3), padding=1, padding_mode="reflect", name=f"upconv_{i}_0")(x)
            x = elu(x)
            x = interpolate(x, scale_factor=2, mode="nearest")
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, feats[i - 1]], axis=-1)
            x = Conv(self.num_ch_dec[i], (3, 3), padding=1, padding_mode="reflect", name=f"upconv_{i}_1")(x)
            x = elu(x)
            if i in self.scales:
                d = Conv(1, (3, 3), padding=1, padding_mode="reflect", name=f"dispconv_{i}")(x)
                outputs[("disp", i)] = jax.nn.sigmoid(d)
        return outputs
