"""Fused Swin window-attention Pallas kernel (TPU).

Fuses qkv projection -> per-head (f32 logits + relative position bias +
shift mask) -> softmax -> PV -> output projection into one VMEM-resident
kernel over blocks of windows. The XLA path materializes the (B_, H, N, N)
f32 logits tensor in HBM and pays layout churn between the einsums; here
logits never leave VMEM. Window partition/reverse stay outside (cheap XLA
transposes).

Mosaic layout notes (why the kernel is written this way): sublane-collapsing
reshapes like (7, 7, C) -> (49, C) are unsupported ("infer-vector-layout:
unsupported shape cast"), so heads are split with *static lane slices* of
the (G, N, 3C) qkv tensor and merged back with a minor-axis concatenate; the
only dot_generals are 3-D with one leading batch dim, which Mosaic lowers
directly.

Semantics: identical to models/backbones/swin.py WindowAttention (itself
specced on reference model/modeling/backbone/swin.py:74-172): zero-padded
edge tokens participate; f32 logit accumulation; additive -100 shift masks.

Shift-mask structure: with Hp, Wp multiples of the window and cyclic shift
s < window, only the last row / last column of windows contain wrapped
content, so the reference's (nW, N, N) mask collapses to 4 distinct masks
indexed by (is_bottom_row, is_last_col).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=16)
def four_shift_masks(window: int, shift: int) -> np.ndarray:
    """(4, N, N) additive masks [interior, right, bottom, corner] — the four
    distinct values of the reference's per-window shift mask
    (swin.py:413-440) on a wrap-free tiling."""
    from ..models.backbones.swin import _shift_attn_mask

    full = _shift_attn_mask(2 * window, 2 * window, window, shift)
    # window order: (row0,col0)=interior, (row0,col1)=right, (row1,col0)=bottom, (row1,col1)=corner
    return np.asarray(full, np.float32)


def window_mask_ids(hp: int, wp: int, window: int) -> np.ndarray:
    """(nW,) int32 mask index per window in partition order:
    2*is_bottom_row + is_last_col."""
    nr, nc = hp // window, wp // window
    ids = np.zeros((nr, nc), np.int32)
    ids[-1, :] += 2
    ids[:, -1] += 1
    return ids.reshape(-1)


def _kernel(xw_ref, qkvk_ref, qkvb_ref, projk_ref, projb_ref, bias_ref,
            masks_ref, mid_ref, out_ref, *, num_heads: int, group: int,
            shifted: bool):
    G = group
    N = xw_ref.shape[1]
    C = xw_ref.shape[2]
    H = num_heads
    Dh = C // H
    scale = Dh ** -0.5

    x = xw_ref[:]  # (G, N, C)
    qkv = jax.lax.dot_general(
        x, qkvk_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + qkvb_ref[:].astype(jnp.float32)).astype(x.dtype)  # (G, N, 3C)

    if shifted:
        # per-window additive mask selected from the 4 distinct patterns
        mask = jnp.concatenate(
            [masks_ref[mid_ref[pl.program_id(0), g]][None] for g in range(G)], axis=0
        )  # (G, N, N) f32

    head_outs = []
    for h in range(H):
        q = qkv[:, :, h * Dh : (h + 1) * Dh] * scale
        k = qkv[:, :, C + h * Dh : C + (h + 1) * Dh]
        v = qkv[:, :, 2 * C + h * Dh : 2 * C + (h + 1) * Dh]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, N, N)
        logits = logits + bias_ref[h][None]
        if shifted:
            logits = logits + mask
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        head_outs.append(
            jax.lax.dot_general(
                p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )  # (G, N, Dh)

    merged = jnp.concatenate(head_outs, axis=-1)  # (G, N, C)
    proj = jax.lax.dot_general(
        merged, projk_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = (proj + projb_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def window_attention_fused(
    xw: jnp.ndarray,  # (B_, N, C) windowed tokens (window_partition output)
    qkv_kernel: jnp.ndarray,  # (C, 3C)
    qkv_bias: jnp.ndarray,  # (3C,)
    proj_kernel: jnp.ndarray,  # (C, C)
    proj_bias: jnp.ndarray,  # (C,)
    rel_bias: jnp.ndarray,  # (H, N, N)
    mask_ids: jnp.ndarray,  # (B_,) int32 (ignored when shift == 0)
    window: int,
    num_heads: int,
    shift: int,
    group: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    B_, N, C = xw.shape
    assert N == window * window
    if group <= 0:
        # keep the kernel's VMEM working set (dominated by the f32 qkv
        # intermediate, ~22 bytes/token/channel) under ~8 MB
        group = int(min(16, max(4, 8_000_000 // (((N + 7) // 8 * 8) * C * 22))))

    # Mosaic requires 8-aligned sublane dims for the flattening reshapes its
    # dot lowering performs: pad token count 49 -> 56 with zero tokens whose
    # logit COLUMNS are masked to -1e9 (pad rows produce garbage that is
    # sliced off below; real rows never attend to pad columns).
    Np = ((N + 7) // 8) * 8
    tok_pad = Np - N
    if tok_pad:
        xw = jnp.pad(xw, ((0, 0), (0, tok_pad), (0, 0)))

    pad = (-B_) % group
    if pad:
        xw = jnp.pad(xw, ((0, pad), (0, 0), (0, 0)))
        mask_ids = jnp.pad(mask_ids, (0, pad))
    Bp = B_ + pad
    mids2d = mask_ids.astype(jnp.int32).reshape(Bp // group, group)

    bias = jnp.zeros((num_heads, Np, Np), jnp.float32)
    bias = bias.at[:, :N, :N].set(rel_bias.astype(jnp.float32))
    bias = bias.at[:, :, N:].set(-1e9)  # pad columns masked out

    if shift > 0:
        m4 = np.zeros((4, Np, Np), np.float32)
        m4[:, :N, :N] = four_shift_masks(window, shift)
        masks = jnp.asarray(m4)
    else:
        masks = jnp.zeros((4, Np, Np), jnp.float32)

    kern = functools.partial(
        _kernel, num_heads=num_heads, group=group, shifted=shift > 0
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Bp, Np, C), xw.dtype),
        grid=(Bp // group,),
        in_specs=[
            pl.BlockSpec((group, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (n_blocks, group) id table
        ],
        out_specs=pl.BlockSpec((group, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xw, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias, masks, mids2d)
    return out[:B_, :N]
