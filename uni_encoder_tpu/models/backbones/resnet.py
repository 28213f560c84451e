"""Custom ResNet backbone with an exposed stem feature.

Capability spec: reference model/modeling/backbone/resnet.py
(build_custom_resnet_backbone, :614-695) — a detectron2-style ResNet whose
distinguishing feature is that the *stem* (7x7/2 conv + BN + relu + 3x3/2
maxpool, stride 4) is an output feature alongside res2..res5 (config
IN_FEATURES: [stem, res2..res5], Base-Cityscapes-UnifiedSegmentation.yaml).
Supports BasicBlock (depth 18/34) and BottleneckBlock (50/101); BatchNorm
uses stored running stats at inference (SyncBN equivalence in training is
cross-replica batch stats via axis_name in the train step).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import BACKBONES
from ..layers import FrozenBatchNorm, relu

_BLOCKS_PER_STAGE = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


def _maxpool_3x3_s2(x):
    # torch max_pool2d(kernel=3, stride=2, padding=1)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride), padding=1, use_bias=False, name="conv1"
        )(x)
        out = FrozenBatchNorm(self.features, name="bn1")(out)
        out = relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            sc = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="shortcut_conv"
            )(x)
            sc = FrozenBatchNorm(self.features, name="shortcut_bn")(sc)
        else:
            sc = x
        return relu(out + sc)


class BottleneckBlock(nn.Module):
    features: int  # output channels (4x bottleneck)
    bottleneck: int
    stride: int = 1
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x):
        s1, s2 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = nn.Conv(self.bottleneck, (1, 1), strides=(s1, s1), use_bias=False, name="conv1")(x)
        out = relu(FrozenBatchNorm(self.bottleneck, name="bn1")(out))
        out = nn.Conv(self.bottleneck, (3, 3), strides=(s2, s2), padding=1, use_bias=False, name="conv2")(out)
        out = relu(FrozenBatchNorm(self.bottleneck, name="bn2")(out))
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(self.features, name="bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            sc = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="shortcut_conv"
            )(x)
            sc = FrozenBatchNorm(self.features, name="shortcut_bn")(sc)
        else:
            sc = x
        return relu(out + sc)


@BACKBONES.register(name="resnet")
class ResNet(nn.Module):
    depth: int = 18
    stem_out_channels: int = 64
    res2_out_channels: int = 64
    stride_in_1x1: bool = False
    out_features: Sequence[str] = ("stem", "res2", "res3", "res4", "res5")

    @property
    def out_channels(self):
        c2 = self.res2_out_channels
        chans = {"stem": self.stem_out_channels}
        for i, name in enumerate(("res2", "res3", "res4", "res5")):
            chans[name] = c2 * 2 ** i
        return {k: v for k, v in chans.items() if k in self.out_features}

    @nn.compact
    def __call__(self, x):
        outs = {}
        x = nn.Conv(
            self.stem_out_channels, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False, name="stem_conv1"
        )(x)
        x = relu(FrozenBatchNorm(self.stem_out_channels, name="stem_bn1")(x))
        x = _maxpool_3x3_s2(x)
        if "stem" in self.out_features:
            outs["stem"] = x

        blocks = _BLOCKS_PER_STAGE[self.depth]
        use_bottleneck = self.depth >= 50
        for i, n_blocks in enumerate(blocks):
            name = f"res{i+2}"
            features = self.res2_out_channels * 2 ** i
            stride = 1 if i == 0 else 2
            for j in range(n_blocks):
                s = stride if j == 0 else 1
                if use_bottleneck:
                    x = BottleneckBlock(
                        features, features // 4, stride=s, stride_in_1x1=self.stride_in_1x1,
                        name=f"{name}_block{j}",
                    )(x)
                else:
                    x = BasicBlock(features, stride=s, name=f"{name}_block{j}")(x)
            if name in self.out_features:
                outs[name] = x
        return outs
