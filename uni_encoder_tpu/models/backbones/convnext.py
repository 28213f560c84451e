"""ConvNeXt backbone.

Capability spec: reference model/modeling/backbone/convnext.py (D2ConvNeXt,
:152-213): 4x4/4 stem + LN, stages of blocks (7x7 depthwise conv, LN,
pointwise 4x MLP with GELU, LayerScale gamma, residual), LN+2x2/2 conv
downsampling between stages, per-output channels-first LN; emits
{res2..res5}.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .. import BACKBONES
from ..layers import gelu, drop_path


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init_value: float = 1e-6
    drop_path_rate: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=self.dim, name="dwconv"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = gelu(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init_value), (self.dim,)
            )
            x = gamma * x
        # stochastic depth on the residual (reference convnext.py:31-44)
        if not self.deterministic and self.drop_path_rate > 0.0:
            x = drop_path(x, self.drop_path_rate, False, self.make_rng("drop_path"))
        return shortcut + x


@BACKBONES.register(name="convnext")
class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    layer_scale_init_value: float = 1e-6
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0
    deterministic: bool = True

    @property
    def out_channels(self):
        return {f"res{i+2}": self.dims[i] for i in self.out_indices}

    @nn.compact
    def __call__(self, x):
        import numpy as np

        outs = {}
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        blk = 0
        for i, depth in enumerate(self.depths):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID", name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f"downsample_{i}_norm")(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2), padding="VALID", name=f"downsample_{i}_conv")(x)
            for j in range(depth):
                x = ConvNeXtBlock(
                    self.dims[i], self.layer_scale_init_value,
                    drop_path_rate=float(dpr[blk]), deterministic=self.deterministic,
                    name=f"stages_{i}_blocks_{j}"
                )(x)
                blk += 1
            if i in self.out_indices:
                outs[f"res{i+2}"] = nn.LayerNorm(epsilon=1e-6, name=f"out_norm{i}")(x)
        return outs
