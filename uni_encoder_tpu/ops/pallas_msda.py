"""Pallas TPU kernel for multi-scale deformable attention sampling.

The XLA formulation (ops/ms_deform_attn.py) round-trips each of the 12
corner-gather intermediates through HBM. This kernel keeps each (batch,
head)'s per-level value maps resident in VMEM (levels at Cityscapes bench
shapes sum to ~5 MB < 16 MB VMEM) and performs all L*P*4 gathers + the
weighted reduction for a block of queries in one pass, writing only the
(QB, D) result.

Gathers use jnp.take along the sublane axis of a VMEM-resident (HW, D)
array, which Mosaic lowers to dynamic-gather. Falls back to the XLA
implementation if lowering fails (ms_deform_attn_auto).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .ms_deform_attn import ms_deform_attn as _xla_ms_deform_attn

try:  # pallas is TPU-only in this context
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _kernel(levels, loc_ref, attn_ref, out_ref, *, spatial_shapes, D):
    """levels: tuple of VMEM refs, each (1, HW_l, D); loc (1, QB, L, P, 2);
    attn (1, QB, L, P); out (1, QB, D)."""
    QB = out_ref.shape[1]
    P = attn_ref.shape[3]
    acc = jnp.zeros((QB, D), jnp.float32)
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = levels[lvl][0]  # (HW, D)
        loc = loc_ref[0, :, lvl]  # (QB, P, 2)
        w_l = attn_ref[0, :, lvl]  # (QB, P)
        fx = loc[..., 0] * W - 0.5
        fy = loc[..., 1] * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = fx - x0
        wy = fy - y0
        for dy, wgt_y in ((0.0, 1.0 - wy), (1.0, wy)):
            for dx, wgt_x in ((0.0, 1.0 - wx), (1.0, wx)):
                xi = x0 + dx
                yi = y0 + dy
                valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
                xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
                yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
                lin = (yi_c * W + xi_c).reshape(QB * P)
                g = jnp.take(v, lin, axis=0).reshape(QB, P, D)
                w = (wgt_x * wgt_y * valid.astype(jnp.float32) * w_l)[..., None]
                acc = acc + jnp.sum(g * w, axis=1)
    out_ref[0] = acc


def ms_deform_attn_pallas(
    value: jnp.ndarray,  # (B, S, M, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # (B, Lq, M, L, P, 2)
    attention_weights: jnp.ndarray,  # (B, Lq, M, L, P)
    query_block: int = 1024,
) -> jnp.ndarray:
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)

    # pad queries to a block multiple
    Lq_pad = -(-Lq // query_block) * query_block
    pad_q = Lq_pad - Lq
    loc = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5)).reshape(B * M, Lq, L, P, 2)
    attn = jnp.transpose(attention_weights, (0, 2, 1, 3, 4)).reshape(B * M, Lq, L, P)
    if pad_q:
        loc = jnp.pad(loc, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0)), constant_values=0.5)
        attn = jnp.pad(attn, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    loc = loc.astype(jnp.float32)
    attn = attn.astype(jnp.float32)

    # split value into per-level (B*M, HW_l, D) fp32 arrays
    levels = []
    start = 0
    v = jnp.transpose(value, (0, 2, 1, 3)).reshape(B * M, S, D).astype(jnp.float32)
    for (h, w) in spatial_shapes:
        levels.append(v[:, start : start + h * w])
        start += h * w

    grid = (B * M, Lq_pad // query_block)
    level_specs = [
        pl.BlockSpec((1, hw.shape[1], D), lambda bm, qb: (bm, 0, 0)) for hw in levels
    ]
    out = pl.pallas_call(
        functools.partial(_kernel_entry, n_levels=L, spatial_shapes=spatial_shapes, D=D),
        grid=grid,
        in_specs=level_specs
        + [
            pl.BlockSpec((1, query_block, L, P, 2), lambda bm, qb: (bm, qb, 0, 0, 0)),
            pl.BlockSpec((1, query_block, L, P), lambda bm, qb: (bm, qb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, query_block, D), lambda bm, qb: (bm, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((B * M, Lq_pad, D), jnp.float32),
    )(*levels, loc, attn)

    out = out[:, :Lq].reshape(B, M, Lq, D)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)
    return out.astype(value.dtype)


def _kernel_entry(*refs, n_levels, spatial_shapes, D):
    levels = refs[:n_levels]
    loc_ref, attn_ref, out_ref = refs[n_levels : n_levels + 3]
    _kernel(levels, loc_ref, attn_ref, out_ref, spatial_shapes=spatial_shapes, D=D)


@functools.lru_cache(maxsize=8)
def _pallas_supported() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        import numpy as np

        shapes = ((4, 4), (2, 2))
        v = jnp.zeros((1, 20, 1, 8), jnp.float32)
        loc = jnp.full((1, 4, 1, 2, 2, 2), 0.5, jnp.float32)
        w = jnp.full((1, 4, 1, 2, 2), 0.25, jnp.float32)
        ms_deform_attn_pallas(v, shapes, loc, w, query_block=8)
        return True
    except Exception:
        return False


def ms_deform_attn_auto(value, spatial_shapes, sampling_locations, attention_weights):
    """Pallas kernel on TPU when it lowers, XLA composition otherwise."""
    if jax.default_backend() in ("tpu", "axon") and _pallas_supported():
        return ms_deform_attn_pallas(value, spatial_shapes, sampling_locations, attention_weights)
    return _xla_ms_deform_attn(value, spatial_shapes, sampling_locations, attention_weights)
