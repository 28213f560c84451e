"""Shared flax building blocks with PyTorch-matching numerics.

Everything is NHWC / channels-last. Parameter layouts are chosen so the
d2-.pkl -> orbax checkpoint converter (engine/checkpoint.py) is a pure
transpose-and-rename pass:

  * Dense.kernel          = torch Linear.weight.T              (in, out)
  * Conv.kernel           = torch Conv2d.weight HWIO           (kh,kw,in,out)
  * MultiheadAttention    = torch nn.MultiheadAttention packing (in_proj as
    a single (E, 3E) kernel, i.e. in_proj_weight.T)
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def relu(x):
    return jax.nn.relu(x)


def gelu(x):
    # torch nn.GELU default = exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def elu(x):
    return jax.nn.elu(x)


ACTIVATIONS = {"relu": relu, "gelu": gelu, "elu": elu, None: lambda x: x}


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (batch-second semantics folded
    into batch-first tensors; inference path, dropout omitted).

    Inputs are (B, L, E). `attn_mask` may be:
      * bool (Lq, Lk) or (B, H, Lq, Lk): True = disallowed
      * float additive mask of the same shapes
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        E, H = self.embed_dim, self.num_heads
        Dh = E // H
        B, Lq, _ = query.shape
        Lk = key.shape[1]

        in_proj = self.param("in_proj", nn.initializers.xavier_uniform(), (E, 3 * E))
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        out_kernel = self.param("out_proj_kernel", nn.initializers.xavier_uniform(), (E, E))
        out_bias = self.param("out_proj_bias", nn.initializers.zeros, (E,))

        q = query @ in_proj[:, :E] + in_bias[:E]
        k = key @ in_proj[:, E : 2 * E] + in_bias[E : 2 * E]
        v = value @ in_proj[:, 2 * E :] + in_bias[2 * E :]

        q = q.reshape(B, Lq, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, H, Dh).transpose(0, 2, 1, 3)

        # A streamed (online-softmax) Pallas kernel for the huge-K unmasked
        # cross-attention layers was benched on the real chip in r4 and LOST
        # end-to-end (6.399 vs 6.918 img/s despite an isolated win at
        # K=131072 — BASELINE.md r4 decision table); removed.
        # dtype-following logits (reference AMP computes attention matmuls in
        # half precision); softmax is jax's stable (max-subtracted) form
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=q.dtype)
        logits = logits / math.sqrt(Dh)
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                attn_mask = attn_mask[None, None]
            if attn_mask.dtype == jnp.bool_:
                logits = jnp.where(attn_mask, jnp.asarray(-jnp.inf, logits.dtype), logits)
            else:
                logits = logits + attn_mask
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        return out @ out_kernel + out_bias


class MLP(nn.Module):
    """DETR-style MLP: relu between layers, last layer linear.

    Spec: reference oneformer_transformer_decoder.py:211-223. Also used as
    the task-token MLP over raw token ids (oneformer_model.py:151-152).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = relu(x)
        return x


class GroupNorm32(nn.Module):
    """GroupNorm(32) matching torch defaults (eps=1e-5, affine)."""

    channels: int
    num_groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5)(x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm matching torch semantics.

    Eval (use_running_average=True, the default): stored running stats —
    matches the reference's .eval() nets for checkpoint parity.

    Train (use_running_average=False): batch statistics over (N, H, W) with
    running-stat updates (momentum 0.9, torch default 1 - 0.1). SyncBN
    (reference config NORM: "SyncBN") comes for free under pjit: with the
    batch sharded over the mesh's data axis, jnp.mean over axis 0 is a
    global cross-replica reduction inserted by GSPMD.
    """

    channels: int
    eps: float = 1e-5
    use_running_average: bool = True
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.channels,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((self.channels,)))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size // x.shape[-1]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


class Conv(nn.Module):
    """nn.Conv with torch-style integer padding and reflect-pad support.

    Matches torch nn.Conv2d(kernel, stride, padding, padding_mode) on NHWC
    inputs; kernel layout is HWIO (= torch OIHW transposed in the checkpoint
    converter).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0
    use_bias: bool = True
    padding_mode: str = "zeros"  # or "reflect"
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.padding
        if self.padding_mode == "reflect" and pad > 0:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
            padding = [(0, 0), (0, 0)]
        else:
            padding = [(pad, pad), (pad, pad)]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1] // self.feature_group_count, self.features),
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=self.strides,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng=None) -> jnp.ndarray:
    """Stochastic depth (timm DropPath). Identity when deterministic."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask
