"""Coarse-to-fine motion decoders (complete 3D flow / motion-mask heads).

Capability spec: reference model/modeling/motion_decoder/
dynamo_motion_decoder_mod.py (MotionDecoderV2): seeds a motion field from
100x the ego-motion vector through a 1x1 conv, then refines scale-by-scale
(res5 -> full-res) with conv/squeeze residual blocks over the concatenated
two-frame features + full-res RGB pair; out_dim=3 -> ("complete_flow", s)
= 0.005*out, out_dim=1 -> ("motion_prob"/"motion_mask", s) with
sigmoid(0.005*out) (:115-125). Instantiated twice by the meta-arch.

MotionDecoderV1 is the earlier variant (dynamo_motion_decoder.py:1-93,
unused by the live configs but part of the release surface): refines over
the *pose-encoder* pyramid [res5..stem, full-res input pair], with a
conv(in+out)->conv(in)+ReLU pair whose two intermediates are re-concatenated
through a 1x1 "redu" conv, and a 0.01 output scale (vs V2's 0.005).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import interpolate
from .layers import FrozenBatchNorm, elu, relu


class _ELUResidualBlock(nn.Module):
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
        return elu(out + sc)


class _FusionStage(nn.Module):
    features: int
    num_blocks: int = 2
    stride: int = 1
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (1, 1), name="proj")(x)
        strides = [self.stride] + [1] * (self.num_blocks - 1)
        for i, s in enumerate(strides):
            x = _ELUResidualBlock(self.features, stride=s, train_bn=self.train_bn, name=f"block{i}")(x)
        return x


class MotionDecoderV1(nn.Module):
    """Reference dynamo_motion_decoder.py MotionDecoder.

    Stages run coarse->fine over the pose-encoder pyramid: stage ii consumes
    pyramid[-1-ii] of [full_res_input, stem, res2..res5] (:41-44), i.e.
    res5 first. Per stage (:55-63):
        x   = concat(upsampled motion, feat)
        x1  = conv3x3(x)            # no activation (:29-33 comments ELU out)
        x2  = relu(conv3x3(x1))
        out = conv1x1(concat(x1, x2)) + upsampled motion
    Scale outputs (:79-91): m_raw = 0.01 * out; out_dim=1 ->
    ("motion_prob"/"motion_mask", s), out_dim=3 -> ("complete_flow", s).
    """

    out_dim: int = 3
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    # encoder channels fine->coarse (ResNet18 pose encoder) — reversed
    # internally like the reference's num_inp_feat[::-1] + [org_in_ch]
    num_inp_feat: Tuple[int, ...] = (64, 64, 128, 256, 512)
    num_input_images: int = 2
    inp_disp: bool = True

    @nn.compact
    def __call__(
        self,
        pyramid: Dict[str, jnp.ndarray],  # full_res_input, stem, res2..res5 (NHWC)
        ego_motion: jnp.ndarray,  # (B, 1, 1, 6)
    ):
        org_in_ch = self.num_input_images * (3 + int(self.inp_disp))
        chans = tuple(reversed(self.num_inp_feat)) + (org_in_ch,)
        order = ["full_res_input", "stem", "res2", "res3", "res4", "res5"]

        motion = nn.Conv(self.out_dim, (1, 1), name="res_trans_conv")(100.0 * ego_motion)
        outs_per_stage = []
        for ii, ch in enumerate(chans):
            feat = pyramid[order[-1 - ii]]
            up = interpolate(motion, size=feat.shape[1:3], mode="bilinear", align_corners=False)
            x = jnp.concatenate([up, feat], axis=-1)
            x1 = nn.Conv(ch, (3, 3), padding=1, name=f"conv{ii}_0")(x)
            x2 = relu(nn.Conv(ch, (3, 3), padding=1, name=f"conv{ii}_1")(x1))
            red = nn.Conv(self.out_dim, (1, 1), name=f"redu{ii}")(
                jnp.concatenate([x1, x2], axis=-1)
            )
            motion = red + up
            outs_per_stage.append(motion)

        outs = {}
        for scale in self.scales:
            ii = len(chans) - 1 - scale
            m_raw = 0.01 * outs_per_stage[ii]
            if self.out_dim == 1:
                outs[("motion_prob", scale)] = m_raw
                outs[("motion_mask", scale)] = jax.nn.sigmoid(m_raw)
            elif self.out_dim == 3:
                outs[("complete_flow", scale)] = m_raw
            else:
                raise ValueError(f"out_dim={self.out_dim}")
        return outs


class MotionDecoderV2(nn.Module):
    """out_dim=3: complete flow; out_dim=1: motion probability/mask."""

    out_dim: int = 3
    train_bn: bool = False
    # emitted output scales (reference: 4); the coarse-to-fine stage chain
    # always runs in full — n_scales < 4 only drops coarse outputs (micro
    # dryrun knob via ModelConfig.num_depth_scales)
    n_scales: int = 4
    # per-stage input feature channels (stage 0 = RGB pair, 1 = refined res2,
    # 2..5 = concatenated two-frame res2..res5)
    num_inp_feat = (6, 64, 192, 384, 768, 1536)

    @nn.compact
    def __call__(
        self,
        full_res_input: jnp.ndarray,  # (B, H, W, 6) two-frame RGB
        features: Dict[str, jnp.ndarray],  # concatenated two-frame res2..res5
        ego_motion: jnp.ndarray,  # (B, 1, 1, 6) [translation || axisangle]
    ):
        feat0 = full_res_input
        feat1 = interpolate(
            jax.lax.stop_gradient(features["res2"]), scale_factor=2, mode="bilinear", align_corners=False
        )
        feat1 = _FusionStage(64, stride=1, train_bn=self.train_bn, name="layer0")(feat1)

        res_trans = nn.Conv(self.out_dim, (1, 1), name="res_trans_conv")(100.0 * ego_motion)

        def stage(idx, feat, motion_field_src):
            ch = self.num_inp_feat[idx]
            motion_field = interpolate(
                motion_field_src, size=feat.shape[1:3], mode="bilinear", align_corners=False
            )
            xa = nn.Conv(ch, (3, 3), padding=1, name=f"conv{idx}_0")(
                jnp.concatenate([motion_field, feat], axis=-1)
            )
            xb = relu(nn.Conv(ch, (3, 3), padding=1, name=f"conv{idx}_1")(xa))
            out = nn.Conv(self.out_dim, (1, 1), name=f"squeeze{idx}")(
                jnp.concatenate([xa, xb], axis=-1)
            )
            return out + motion_field

        out5 = stage(5, features["res5"], res_trans)
        out4 = stage(4, features["res4"], out5)
        out3 = stage(3, features["res3"], out4)
        out2 = stage(2, features["res2"], out3)
        out1 = stage(1, feat1, out2)
        out0 = stage(0, feat0, out1)

        outs = {}
        for scale, o in enumerate((out0, out1, out2, out3)[: self.n_scales]):
            if self.out_dim == 1:
                outs[("motion_prob", scale)] = 0.005 * o
                outs[("motion_mask", scale)] = jax.nn.sigmoid(0.005 * o)
            elif self.out_dim == 3:
                outs[("complete_flow", scale)] = 0.005 * o
            else:
                raise ValueError(f"out_dim={self.out_dim}")
        return outs
