"""Multi-scale deformable-attention pixel decoder (production segmentation
pixel decoder) and its depth variant.

Capability spec: reference model/modeling/pixel_decoder/msdeformattn.py —
MSDeformAttnPixelDecoder (:179-386): project {res3,res4,res5} to 256ch
(1x1 conv + GroupNorm32), run a 6-layer deformable-attention encoder over
the flattened multi-scale token sequence, split tokens back into per-level
maps, extend to stride-4 mask features through an FPN lateral/output conv
pair, emit mask_features via a 1x1 conv. DepthMSDeformAttnPixelDecoder
(:389-626) shares the trunk and emits per-level sigmoid disparity maps
through reflect-padded conv/GN/ELU stacks.

TPU-native: reference points & sampling grids are static-shape constants;
the deformable attention core is ops.ms_deform_attn (batched corner gathers
in fp32 — the reference marks this op fp32-only via @autocast(enabled=False),
:336). All token tensors are (B, N, C) with N = sum H_l*W_l static.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import PIXEL_DECODERS
from ...ops import interpolate, ms_deform_attn, position_embedding_sine
from ..layers import relu


@functools.lru_cache(maxsize=32)
def _reference_points(spatial_shapes: Tuple[Tuple[int, int], ...]) -> np.ndarray:
    """(N, 2) normalized (x, y) token centers, concatenated over levels.

    Spec: MSDeformAttnTransformerEncoder.get_reference_points
    (msdeformattn.py:151-166) with valid_ratios == 1 (inference masks are
    all-False zeros; :68-69).
    """
    pts = []
    for (H, W) in spatial_shapes:
        ys = (np.arange(H, dtype=np.float32) + 0.5) / H
        xs = (np.arange(W, dtype=np.float32) + 0.5) / W
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return np.concatenate(pts, axis=0)


def _sampling_offsets_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Reference _reset_parameters (ops/modules/ms_deform_attn.py:58-77):
    zero kernels for sampling_offsets/attention_weights, and the
    sampling_offsets *bias* set to the per-head unit direction on an 8-point
    compass, scaled by (point index + 1) — load-bearing for from-scratch
    training convergence of deformable attention."""

    def init(key, shape, dtype=jnp.float32):
        del key
        thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * np.pi / n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (M, 2)
        grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        for p in range(n_points):
            grid[:, :, p] *= p + 1
        flat = grid.reshape(-1)
        assert flat.shape == tuple(shape), (flat.shape, shape)
        return jnp.asarray(flat, dtype)

    return init


class MSDeformAttnModule(nn.Module):
    """Deformable attention block: learned offsets/weights + sampling core.

    Spec: reference ops/modules/ms_deform_attn.py:37-126, including
    _reset_parameters' directional sampling-offset initialization (:58-77).
    """

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, N, C) — src + pos embed
        reference_points: jnp.ndarray,  # (N, 2) normalized
        value_src: jnp.ndarray,  # (B, N, C) — src without pos
        spatial_shapes: Tuple[Tuple[int, int], ...],
    ) -> jnp.ndarray:
        B, N, C = query.shape
        M, L, P = self.n_heads, self.n_levels, self.n_points
        D = C // M

        value = nn.Dense(
            C, kernel_init=nn.initializers.xavier_uniform(), name="value_proj"
        )(value_src)
        value = value.reshape(B, N, M, D)

        offsets = nn.Dense(
            M * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offsets_bias_init(M, L, P),
            name="sampling_offsets",
        )(query)
        weights = nn.Dense(
            M * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query)

        # component-major producer chain (N on LANES): one transpose of each
        # Dense output, then softmax / location math run fully vectorized
        # instead of on minor dims of 12 / 2 (see ops/ms_deform_attn.py
        # layout notes)
        off_cm = jnp.transpose(offsets, (0, 2, 1)).reshape(B, M, L, P, 2, N)
        w_cm = jnp.transpose(weights, (0, 2, 1)).reshape(B, M, L * P, N)
        w_cm = jax.nn.softmax(w_cm, axis=2).reshape(B, M, L, P, N)

        # ABSOLUTE source coordinates: the reference normalizes offsets by
        # the target level's (W, H) and the sampling core rescales by the
        # same (W, H) — the two cancel, so fx = (ref_x*W - 0.5) + off_x
        # exactly (one fewer rounding than the reference's normalize ->
        # rescale round trip). The ref-scaled grid is a precomputed constant.
        ref_cm = jnp.transpose(reference_points.astype(jnp.float32), (1, 0))  # (2, N)
        wh = jnp.asarray(
            [[[w], [h]] for (h, w) in spatial_shapes], jnp.float32
        )  # (L, 2, 1)
        ref_abs = ref_cm[None] * wh - 0.5  # (L, 2, N)
        loc_cm = ref_abs[None, None, :, None] + off_cm  # (B, M, L, P, 2, N)

        out = ms_deform_attn(value, spatial_shapes, loc_cm, w_cm, layout="cm_abs")
        return nn.Dense(
            C, kernel_init=nn.initializers.xavier_uniform(), name="output_proj"
        )(out)


class MSDeformAttnEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        src2 = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points, name="self_attn"
        )(src + pos, reference_points, src, spatial_shapes)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + src2)
        src2 = nn.Dense(self.d_ffn, name="linear1")(src)
        src2 = nn.Dense(self.d_model, name="linear2")(relu(src2))
        src = nn.LayerNorm(epsilon=1e-5, name="norm2")(src + src2)
        return src


class _MSDeformTrunk(nn.Module):
    """Shared trunk of both decoders: input projections + deformable encoder
    + FPN extension. Returns the list of per-level 256ch maps, ordered
    low-res -> high-res: [res5, res4, res3, (fpn res2)]."""

    conv_dim: int = 256
    transformer_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    fpn_in_features: Sequence[str] = ("res2",)  # high-res features for FPN tail

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        C = self.conv_dim
        L = len(self.transformer_in_features)

        # ---- project transformer inputs, low-res first (res5 -> res3)
        srcs, poss, shapes = [], [], []
        for f in reversed(list(self.transformer_in_features)):
            # dtype-following (bf16-capable); the fp32 island is the sampling
            # core inside ops.ms_deform_attn, matching the reference's
            # autocast(enabled=False) scope
            x = features[f]
            i = len(srcs)
            x = nn.Conv(C, (1, 1), name=f"input_proj_{i}_conv")(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"input_proj_{i}_gn")(x)
            srcs.append(x)
            h, w = x.shape[1], x.shape[2]
            shapes.append((h, w))
            poss.append(position_embedding_sine(h, w, C // 2))

        level_embed = self.param("level_embed", nn.initializers.normal(1.0), (L, C))

        B = srcs[0].shape[0]
        src_flat = jnp.concatenate([s.reshape(B, -1, C) for s in srcs], axis=1)
        pos_flat = jnp.concatenate(
            [
                (p.reshape(1, -1, C) + level_embed[i][None, None]).astype(src_flat.dtype)
                for i, p in enumerate(poss)
            ],
            axis=1,
        )
        pos_flat = jnp.broadcast_to(pos_flat, src_flat.shape)

        spatial_shapes = tuple(shapes)
        ref_pts = jnp.asarray(_reference_points(spatial_shapes))

        y = src_flat
        for li in range(self.transformer_layers):
            y = MSDeformAttnEncoderLayer(
                d_model=C,
                n_levels=L,
                n_heads=self.n_heads,
                n_points=self.n_points,
                name=f"encoder_layer_{li}",
            )(y, pos_flat, ref_pts, spatial_shapes)

        # ---- split back to maps (low-res first)
        out = []
        start = 0
        for (h, w) in shapes:
            out.append(y[:, start : start + h * w].reshape(B, h, w, C))
            start += h * w

        # ---- FPN tail down to common stride (reference: one level, res2)
        for idx, f in enumerate(reversed(list(self.fpn_in_features))):
            x = features[f]
            lat = nn.Conv(C, (1, 1), use_bias=False, name=f"adapter_{idx+1}_conv")(x)
            lat = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"adapter_{idx+1}_gn")(lat)
            up = interpolate(out[-1], size=lat.shape[1:3], mode="bilinear", align_corners=False)
            z = lat + up
            z = nn.Conv(C, (3, 3), padding=1, use_bias=False, name=f"layer_{idx+1}_conv")(z)
            z = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"layer_{idx+1}_gn")(z)
            z = relu(z)
            out.append(z)

        return out


@PIXEL_DECODERS.register(name="MSDeformAttnPixelDecoder")
class MSDeformAttnPixelDecoder(nn.Module):
    conv_dim: int = 256
    mask_dim: int = 256
    transformer_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    fpn_in_features: Sequence[str] = ("res2",)
    num_multi_scale: int = 3

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        out = _MSDeformTrunk(
            self.conv_dim,
            self.transformer_layers,
            self.n_heads,
            self.n_points,
            self.transformer_in_features,
            self.fpn_in_features,
            name="trunk",
        )(features)
        mask_features = nn.Conv(self.mask_dim, (1, 1), name="mask_features")(out[-1])
        multi_scale = out[: self.num_multi_scale]
        return mask_features, out[0], multi_scale


@PIXEL_DECODERS.register(name="DepthMSDeformAttnPixelDecoder")
class DepthMSDeformAttnPixelDecoder(nn.Module):
    conv_dim: int = 256
    transformer_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    fpn_in_features: Sequence[str] = ("res2",)

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        out = _MSDeformTrunk(
            self.conv_dim,
            self.transformer_layers,
            self.n_heads,
            self.n_points,
            self.transformer_in_features,
            self.fpn_in_features,
            name="trunk",
        )(features)
        C = self.conv_dim
        disps = {}
        from ..layers import Conv, elu

        for i, o in enumerate(out):
            z = Conv(C // 2, (3, 3), padding=1, padding_mode="reflect", name=f"low_disp_{i}_conv0")(o)
            z = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"low_disp_{i}_gn0")(z)
            z = elu(z)
            z = Conv(C // 2, (3, 3), padding=1, padding_mode="reflect", name=f"low_disp_{i}_conv1")(z)
            z = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"low_disp_{i}_gn1")(z)
            z = elu(z)
            z = nn.Conv(1, (1, 1), name=f"low_disp_{i}_out")(z)
            # out is ordered low-res->high-res; disp scale s counts from
            # high-res (s=0) like the reference's {("disp", s)} dict
            disps[("disp", len(out) - 1 - i)] = jax.nn.sigmoid(z)
        return disps
