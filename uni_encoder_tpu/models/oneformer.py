"""UniEncoder meta-architecture.

Capability spec: reference model/oneformer_model.py (OneFormer, :30-492):
one shared backbone feeds (a) the task-conditioned mask-classification head
for segmentation items and (b) the two-frame pose/motion/depth stack for
sequence items. Post-processing (semantic/panoptic/instance/depth inference)
lives in inference/postprocess.py as vectorized device code.

TPU-native differences:
  * pure-functional flax module; one jitted apply per task bundle with
    static input shapes (images pre-normalized, padded to /32 on host);
  * the task string is tokenized on host; the model consumes the (B, 77)
    token ids and feeds them, as floats, through the 2-layer task MLP —
    reproducing the reference's quirk of embedding raw token ids
    (oneformer_model.py:249-251);
  * sequence items batch the two frames through the backbone in a single
    call (2B batch) instead of two sequential passes.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import BACKBONES, META_ARCHS, PIXEL_DECODERS, TRANSFORMER_DECODERS
from ..config import ModelConfig
from ..geometry import transformation_from_parameters
from .layers import MLP
from .motion_decoder import MotionDecoderV2
from .pose_decoder import ResNetLikePoseDecoder
from .transformer_decoder import OneFormerQueryDecoder


def build_backbone(cfg: ModelConfig) -> nn.Module:
    name = cfg.backbone.name
    if name == "swin":
        from .backbones.swin import SwinTransformer

        c = cfg.backbone.swin
        return SwinTransformer(
            embed_dim=c.embed_dim,
            depths=c.depths,
            num_heads=c.num_heads,
            window=c.window_size,
            mlp_ratio=c.mlp_ratio,
            qkv_bias=c.qkv_bias,
            patch_norm=c.patch_norm,
            drop_path_rate=c.drop_path_rate,
            deterministic=not cfg.is_train,
            name="backbone",
        )
    if name == "resnet":
        from .backbones.resnet import ResNet

        c = cfg.backbone.resnet
        return ResNet(
            depth=c.depth,
            stem_out_channels=c.stem_out_channels,
            res2_out_channels=c.res2_out_channels,
            out_features=c.out_features,
            name="backbone",
        )
    if name == "convnext":
        from .backbones.convnext import ConvNeXt

        c = cfg.backbone.convnext
        return ConvNeXt(
            depths=c.depths,
            dims=c.dims,
            layer_scale_init_value=c.layer_scale_init_value,
            drop_path_rate=c.drop_path_rate,
            deterministic=not cfg.is_train,
            name="backbone",
        )
    if name == "dinat":
        from .backbones.dinat import DiNAT

        c = cfg.backbone.dinat
        return DiNAT(
            embed_dim=c.embed_dim,
            depths=c.depths,
            num_heads=c.num_heads,
            kernel_size=c.kernel_size,
            dilations=c.dilations,
            mlp_ratio=c.mlp_ratio,
            drop_path_rate=c.drop_path_rate,
            deterministic=not cfg.is_train,
            name="backbone",
        )
    raise ValueError(f"unknown backbone {name!r}")


def build_pixel_decoder(cfg: ModelConfig, depth: bool) -> nn.Module:
    h = cfg.sem_seg_head
    name = h.depth_decoder_name if depth else h.pixel_decoder_name
    cls = PIXEL_DECODERS.get(name)
    modname = "depth_decoder" if depth else "pixel_decoder"
    if name == "MSDeformAttnPixelDecoder":
        return cls(
            conv_dim=h.convs_dim,
            mask_dim=h.mask_dim,
            transformer_layers=h.transformer_enc_layers,
            n_heads=cfg.one_former.nheads,
            transformer_in_features=h.deformable_transformer_encoder_in_features,
            name=modname,
        )
    if name == "DepthMSDeformAttnPixelDecoder":
        return cls(
            conv_dim=h.convs_dim,
            transformer_layers=h.transformer_enc_layers,
            n_heads=cfg.one_former.nheads,
            transformer_in_features=h.deformable_transformer_encoder_in_features,
            name=modname,
        )
    if name == "TransDSSL":
        return cls(features=h.convs_dim, n_scales=cfg.num_depth_scales, name=modname)
    # FPN-family decoders take conv/mask dims
    try:
        return cls(conv_dim=h.convs_dim, mask_dim=h.mask_dim, name=modname)
    except TypeError:
        return cls(name=modname)


@META_ARCHS.register(name="UniEncoder")
class UniEncoder(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.backbone = build_backbone(cfg)
        self.pixel_decoder = build_pixel_decoder(cfg, depth=False)
        self.depth_decoder = build_pixel_decoder(cfg, depth=True)
        of = cfg.one_former
        self.predictor = OneFormerQueryDecoder(
            num_classes=cfg.sem_seg_head.num_classes,
            hidden_dim=of.hidden_dim,
            num_queries=of.num_object_queries,
            nheads=of.nheads,
            dim_feedforward=of.dim_feedforward,
            dec_layers=of.dec_layers - 1,
            class_dec_layers=of.class_dec_layers,
            mask_dim=cfg.sem_seg_head.mask_dim,
            use_task_norm=of.use_task_norm,
            is_train=cfg.is_train,
            name="predictor",
        )
        # task MLP consumes raw token ids as floats (reference quirk)
        self.task_mlp = MLP(of.hidden_dim, of.hidden_dim, 2, name="task_mlp")
        self.pose_decoder = ResNetLikePoseDecoder(train_bn=cfg.is_train, name="pose_decoder")
        self.motion_decoder = MotionDecoderV2(
            out_dim=3, train_bn=cfg.is_train, n_scales=cfg.num_depth_scales,
            name="motion_decoder",
        )
        self.motion_mask = MotionDecoderV2(
            out_dim=1, train_bn=cfg.is_train, n_scales=cfg.num_depth_scales,
            name="motion_mask",
        )

    def forward_segmentation(self, images: jnp.ndarray, task_tokens: jnp.ndarray) -> Dict:
        """images: (B, H, W, 3) normalized; task_tokens: (B, task_seq_len) int."""
        task = self.task_mlp(task_tokens.astype(jnp.float32))
        # dtype-following (matches the reference's AMP autocast region, which
        # runs the task MLP and decoder at the compute dtype): the raw-token
        # f32 input would otherwise promote the embedding to f32 and poison
        # the WHOLE query-decoder chain — every attention/FFN layer and the
        # (Q, H/4*W/4) mask einsums run f32 instead of bf16. Measured on the
        # real chip (r5): model.apply 129.7 ms vs 116.5 ms for the identical
        # graph with a bf16 task embedding.
        if os.environ.get("TASK_EMB_F32") != "1":  # A/B toggle, remove after hw verdict
            task = task.astype(images.dtype)
        features = self.backbone(images)
        mask_features, _, multi_scale = self.pixel_decoder(features)
        out = self.predictor(multi_scale, mask_features, task)
        return out

    def forward_sequence(self, images: jnp.ndarray, prev_images: jnp.ndarray) -> Dict:
        """images, prev_images: (B, H, W, 3) normalized current / previous frame."""
        B = images.shape[0]
        # single 2B-batch backbone pass (vs two passes in the reference)
        both = jnp.concatenate([images, prev_images], axis=0)
        feats = self.backbone(both)
        f_cur = {k: v[:B] for k, v in feats.items()}
        f_prev = {k: v[B:] for k, v in feats.items()}
        f_motion = {k: jnp.concatenate([f_prev[k], f_cur[k]], axis=-1) for k in f_cur}

        axisangle, translation = self.pose_decoder(f_motion)
        aa0, t0 = axisangle[:, 0], translation[:, 0]  # frame-pair slot 0
        cam_T_cam = transformation_from_parameters(aa0, t0, invert=True)

        ego = jnp.concatenate([t0, aa0], axis=-1)  # (B, 1, 6)
        ego = jax.lax.stop_gradient(ego).reshape(B, 1, 1, 6)

        full_res = jnp.concatenate([prev_images, images], axis=-1)  # (B,H,W,6)
        flow = self.motion_decoder(full_res, f_motion, ego)
        prob = self.motion_mask(full_res, f_motion, ego)

        disps = self.depth_decoder(f_cur)

        return {
            "disp": disps[("disp", 0)],
            "disps": disps,
            "motion_mask": prob[("motion_mask", 0)],
            "motion_prob": prob[("motion_prob", 0)],
            "complete_flow": flow[("complete_flow", 0)],
            "complete_flows": {k: v for k, v in flow.items()},
            "axisangle": aa0,
            "translation": t0,
            "cam_T_cam": cam_T_cam,
        }

    def forward_sequence_train(
        self, images: jnp.ndarray, prev_images: jnp.ndarray, next_images: jnp.ndarray
    ) -> Dict:
        """Training sequence forward over a 3-frame window: predicts depth at
        4 scales for the center frame and pose/flow/mask for both neighbor
        pairs (frame ids -1 and +1 — the monodepth loss's frame_ids). The
        pose decoder's two output slots map to the two neighbors."""
        B = images.shape[0]
        both = jnp.concatenate([images, prev_images, next_images], axis=0)
        feats = self.backbone(both)
        f_cur = {k: v[:B] for k, v in feats.items()}
        f_prev = {k: v[B : 2 * B] for k, v in feats.items()}
        f_next = {k: v[2 * B :] for k, v in feats.items()}

        disps = self.depth_decoder(f_cur)
        outputs = {
            "disps": {s: disps[("disp", s)] for s in range(self.cfg.num_depth_scales)},
            "cam_T_cam": {},
            "complete_flow": {},
            "motion_mask": {},
            "motion_prob": {},
        }

        # Both neighbor pairs run through the pose/motion decoders as one
        # 2B batch (frames stacked along batch) — one kernel set instead of
        # two. BatchNorm train stats therefore pool both pairs; under data
        # parallelism per-shard BN stats vary by batch composition anyway.
        frame_specs = ((-1, f_prev, prev_images, 0), (1, f_next, next_images, 1))
        fm2 = {
            k: jnp.concatenate(
                [jnp.concatenate([fo[k], f_cur[k]], axis=-1) for _, fo, _, _ in frame_specs],
                axis=0,
            )
            for k in f_cur
        }
        axisangle, translation = self.pose_decoder(fm2)  # (2B, 2, 1, 3) each

        aa_parts, t_parts = [], []
        for i, (frame_id, _, _, slot) in enumerate(frame_specs):
            aa = axisangle[i * B : (i + 1) * B, slot]
            t = translation[i * B : (i + 1) * B, slot]
            outputs["cam_T_cam"][frame_id] = transformation_from_parameters(
                aa, t, invert=(frame_id < 0)
            )
            aa_parts.append(aa)
            t_parts.append(t)
        aa2 = jnp.concatenate(aa_parts, axis=0)  # (2B, 1, 3)
        t2 = jnp.concatenate(t_parts, axis=0)
        ego2 = jax.lax.stop_gradient(jnp.concatenate([t2, aa2], axis=-1)).reshape(2 * B, 1, 1, 6)

        full_res2 = jnp.concatenate(
            [jnp.concatenate([io, images], axis=-1) for _, _, io, _ in frame_specs], axis=0
        )
        flow = self.motion_decoder(full_res2, fm2, ego2)
        prob = self.motion_mask(full_res2, fm2, ego2)
        for i, (frame_id, _, _, _) in enumerate(frame_specs):
            for s in range(self.cfg.num_depth_scales):
                outputs["complete_flow"][(frame_id, s)] = flow[("complete_flow", s)][i * B : (i + 1) * B]
                outputs["motion_mask"][(frame_id, s)] = prob[("motion_mask", s)][i * B : (i + 1) * B]
                outputs["motion_prob"][(frame_id, s)] = prob[("motion_prob", s)][i * B : (i + 1) * B]
        return outputs

    def __call__(self, images: jnp.ndarray, task_tokens: jnp.ndarray) -> Dict:
        return self.forward_segmentation(images, task_tokens)
