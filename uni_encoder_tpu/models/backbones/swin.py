"""Swin Transformer backbone — TPU-native (NHWC, static shapes).

Capability spec: reference model/modeling/backbone/swin.py (D2SwinTransformer,
:686-770): patch-embed 4x4 conv -> 4 stages of W-MSA/SW-MSA blocks with
relative position bias, cyclic shift, patch-merging downsample; emits
{res2: C, res3: 2C, res4: 4C, res5: 8C} with a LayerNorm per output;
size_divisibility 32.

TPU notes:
  * operates on (B, H, W, C) maps; window partition is reshape/transpose
    (layout-friendly), cyclic shift is jnp.roll (XLA rotate).
  * the shifted-window additive mask and the relative-position-bias gather
    are precomputed as numpy constants per static (Hp, Wp) — nothing
    data-dependent under jit.
  * attention runs as batched (B*nW, N, N) einsums on the MXU with fp32
    logits accumulation.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import BACKBONES
from ..layers import drop_path, gelu


@functools.lru_cache(maxsize=32)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(N, N) index into the (2wh-1)*(2ww-1) bias table (reference swin.py:110-121)."""
    coords_h = np.arange(wh)
    coords_w = np.arange(ww)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))  # 2, wh, ww
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # N, N


@functools.lru_cache(maxsize=128)
def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Additive (nW, N, N) mask with 0 / -100 entries (reference swin.py:413-440)."""
    img_mask = np.zeros((hp, wp), np.float32)
    h_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    w_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[h, w] = cnt
            cnt += 1
    mw = img_mask.reshape(hp // window, window, wp // window, window)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, window*window, C). H, W must divide by window."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def window_reverse(windows: jnp.ndarray, window: int, H: int, W: int) -> jnp.ndarray:
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // window) * (W // window))
    x = windows.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class LayerNormP(nn.Module):
    """LayerNorm with the same param tree as nn.LayerNorm ({scale, bias}),
    declared in setup so the fused Swin-block path can read the params
    without running the op. f32 statistics, result in input dtype — the
    flax nn.LayerNorm contract."""

    features: int
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + self.epsilon)
        y = y * self.scale.astype(jnp.float32) + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


class DenseP(nn.Module):
    """Dense with the same param tree as nn.Dense ({kernel, bias}), declared
    in setup (see LayerNormP)."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def __call__(self, x):
        return x @ self.kernel.astype(x.dtype) + self.bias.astype(x.dtype)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True

    def setup(self):
        C, H = self.dim, self.num_heads
        self.qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.xavier_uniform(), (C, 3 * C)
        )
        if self.qkv_bias:
            self.qkv_b = self.param("qkv_bias", nn.initializers.zeros, (3 * C,))
        self.bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) * (2 * self.window - 1), H),
        )
        self.out_kernel = self.param(
            "proj_kernel", nn.initializers.xavier_uniform(), (C, C)
        )
        self.out_bias = self.param("proj_bias", nn.initializers.zeros, (C,))

    def rel_bias(self):
        N = self.window * self.window
        idx = _relative_position_index(self.window, self.window).reshape(-1)
        return self.bias_table[idx].reshape(N, N, self.num_heads).transpose(2, 0, 1)

    def __call__(self, x: jnp.ndarray, attn_mask) -> jnp.ndarray:
        # x: (B_, N, C); attn_mask: None or (nW, N, N) additive, B_ = B*nW.
        B_, N, C = x.shape
        H = self.num_heads
        Dh = C // H
        scale = Dh ** -0.5

        qkv_kernel = self.qkv_kernel
        qkv_b = self.qkv_b if self.qkv_bias else jnp.zeros((3 * C,), x.dtype)
        rel_bias = self.rel_bias()  # H, N, N
        out_kernel = self.out_kernel
        out_bias = self.out_bias

        qkv = x @ qkv_kernel + qkv_b
        qkv = qkv.reshape(B_, N, 3, H, Dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]

        # dtype-following logits: under bf16 this matches the reference's AMP
        # behavior (autocast computes the QK^T matmul in half precision,
        # msdeformattn.py:336 marks only the deformable core fp32-only)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=q.dtype)
        attn = attn + rel_bias[None]

        if attn_mask is not None:
            nW = attn_mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, H, N, N) + attn_mask[None, :, None]
            attn = attn.reshape(B_, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return out @ out_kernel + out_bias


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    deterministic: bool = True

    def _drop_path(self, z):
        if self.deterministic or self.drop_path_rate == 0.0:
            return z
        return drop_path(z, self.drop_path_rate, False, self.make_rng("drop_path"))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C)
        B, H, W, C = x.shape
        ws = self.window
        hidden = int(C * self.mlp_ratio)

        norm1 = LayerNormP(C, epsilon=1e-5, name="norm1")
        norm2 = LayerNormP(C, epsilon=1e-5, name="norm2")
        attn = WindowAttention(self.dim, ws, self.num_heads, self.qkv_bias, name="attn")
        fc1 = DenseP(C, hidden, name="mlp_fc1")
        fc2 = DenseP(hidden, C, name="mlp_fc2")

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        Hp, Wp = H + pad_b, W + pad_r

        shortcut = x
        x = norm1(x)

        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        if self.shift > 0:
            x = jnp.roll(x, shift=(-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, ws, self.shift))
        else:
            mask = None

        xw = window_partition(x, ws)
        # NOTE: three generations of fused Pallas Swin kernels (attention-only
        # r2; whole-block megakernel r4-r5) each won in isolation but LOST
        # end-to-end on the real chip (whole-block: 6.217 vs 6.906 img/s at
        # 1024x2048, r5 decision table) — a Pallas custom call is a fusion
        # and scheduling barrier for the surrounding pad/roll/partition
        # chain, and XLA's cross-op fusion beats the kernels in context.
        # All were deleted per the flip-after-green policy; measurements and
        # post-mortems live in BASELINE.md.
        xw = attn(xw, mask)
        x = window_reverse(xw, ws, Hp, Wp)

        if self.shift > 0:
            x = jnp.roll(x, shift=(self.shift, self.shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W]

        # stochastic depth on both residual branches (reference
        # swin.py:148-152 applies timm DropPath with a per-block rate)
        x = shortcut + self._drop_path(x)
        y = norm2(x)
        y = fc1(y)
        y = gelu(y)
        y = fc2(y)
        return x + self._drop_path(y)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)
        return x


@BACKBONES.register(name="swin")
class SwinTransformer(nn.Module):
    """Returns {"res2".."res5"} NHWC feature maps."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_norm: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0  # linspace schedule over all blocks (train)
    deterministic: bool = True

    @property
    def out_channels(self):
        return {f"res{i+2}": int(self.embed_dim * 2 ** i) for i in self.out_indices}

    @property
    def out_strides(self):
        return {f"res{i+2}": 4 * 2 ** i for i in self.out_indices}

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict:
        # x: (B, H, W, 3), H and W multiples of 32 (size_divisibility)
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID", name="patch_embed_proj")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)

        outs = {}
        num_layers = len(self.depths)
        total_blocks = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total_blocks)
        blk = 0
        for i in range(num_layers):
            dim = int(self.embed_dim * 2 ** i)
            for j in range(self.depths[i]):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[i],
                    window=self.window,
                    shift=0 if j % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop_path_rate=float(dpr[blk]),
                    deterministic=self.deterministic,
                    name=f"layers_{i}_blocks_{j}",
                )(x)
                blk += 1
            if i in self.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{i}")(x)
                outs[f"res{i+2}"] = out
            if i < num_layers - 1:
                x = PatchMerging(dim=dim, name=f"layers_{i}_downsample")(x)
        return outs
