"""ResNet-like pose decoder over concatenated two-frame backbone features.

Capability spec: reference model/modeling/pose_decoder/
resnet_like_pose_decoder.py:30-73 — progressive fusion of 2-frame Swin-T
features (192 / 384+64 / 768+128 / 1536+256 channels), squeeze to 256,
3 pose convs, global mean, 0.01-scaled (axisangle, translation) for 2
frames. BatchNorm runs with stored stats at inference (reference nets are
SyncBN in training, eval() at inference).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm, relu


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride), padding=1, use_bias=False, name="conv1"
        )(x)
        out = FrozenBatchNorm(self.features, use_running_average=not self.train_bn, name="bn1")(out)
        out = relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = FrozenBatchNorm(self.features, use_running_average=not self.train_bn, name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            sc = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="shortcut_conv"
            )(x)
            sc = FrozenBatchNorm(self.features, use_running_average=not self.train_bn, name="shortcut_bn")(sc)
        else:
            sc = x
        return relu(out + sc)


class _Stage(nn.Module):
    features: int
    num_blocks: int = 2
    stride: int = 2
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (1, 1), name="proj")(x)
        strides = [self.stride] + [1] * (self.num_blocks - 1)
        for i, s in enumerate(strides):
            x = ResidualBlock(self.features, stride=s, train_bn=self.train_bn, name=f"block{i}")(x)
        return x


class ResNetLikePoseDecoder(nn.Module):
    num_frames_to_predict_for: int = 2
    train_bn: bool = False

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        out = _Stage(64, train_bn=self.train_bn, name="layer1")(features["res2"])
        out = _Stage(128, train_bn=self.train_bn, name="layer2")(jnp.concatenate([out, features["res3"]], axis=-1))
        out = _Stage(256, train_bn=self.train_bn, name="layer3")(jnp.concatenate([out, features["res4"]], axis=-1))
        out = _Stage(512, train_bn=self.train_bn, name="layer4")(jnp.concatenate([out, features["res5"]], axis=-1))
        out = relu(nn.Conv(256, (1, 1), name="squeeze")(out))
        out = relu(nn.Conv(256, (3, 3), padding=1, name="pose_0")(out))
        out = relu(nn.Conv(256, (3, 3), padding=1, name="pose_1")(out))
        out = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1), name="pose_2")(out)
        out = out.mean(axis=(1, 2))  # global average over H, W
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]  # axisangle, translation
