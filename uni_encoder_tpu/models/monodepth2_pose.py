"""monodepth2-style pose model (alternative pose network, unused by the live
configs).

Capability spec: reference model/modeling/pose_decoder/
monodepth2_pose_model.py — a ResNet encoder over the 6-channel two-frame
input (build_resnet_encoder, stem accepts num_input_images*3 channels) +
the monodepth2 PoseDecoder (squeeze 1x1 -> two 3x3 convs -> 1x1 to
6*num_frames, global mean, 0.01 scale).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .backbones.resnet import ResNet
from .layers import relu


class Monodepth2PoseDecoder(nn.Module):
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        out = relu(nn.Conv(256, (1, 1), name="squeeze")(features["res5"]))
        out = relu(nn.Conv(256, (3, 3), padding=1, name="pose_0")(out))
        out = relu(nn.Conv(256, (3, 3), padding=1, name="pose_1")(out))
        out = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1), name="pose_2")(out)
        out = out.mean(axis=(1, 2))
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]


class Monodepth2PoseModel(nn.Module):
    """ResNet-18 encoder on a stacked two-frame (B, H, W, 6) input + pose
    decoder."""

    depth: int = 18
    train_bn: bool = False

    @nn.compact
    def __call__(self, frame_pair: jnp.ndarray):
        feats = ResNet(
            depth=self.depth, out_features=("res5",), name="encoder"
        )(frame_pair)
        return Monodepth2PoseDecoder(name="decoder")(feats)
