"""Pallas TPU kernel for multi-scale deformable attention sampling.

The XLA formulation (ops/ms_deform_attn.py) pays HBM latency on every
sampled patch. This kernel keeps each (batch, head)'s per-level value maps
resident in VMEM (levels at Cityscapes shapes sum to ~2.8 MB bf16 < 16 MB
VMEM) and performs all L*P*4 corner reads + the bilinear/attention-weighted
reduction for a block of queries in one pass.

Mosaic's gather support is whole-array per-lane `dynamic_gather`
(take_along_axis with indices.shape == operand.shape), so the kernel packs
the 4 corners' row indices of a query block into full-width index arrays:
per level it issues ceil(4*QB*P / HW) whole-array gathers instead of
4*P row-gathers. Falls back to the XLA implementation when lowering is
unavailable (ms_deform_attn_auto).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .ms_deform_attn import ms_deform_attn as _xla_ms_deform_attn

try:  # pallas TPU backend
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _cdiv(a, b):
    return -(-a // b)


def _kernel(*refs, n_levels, spatial_shapes, D, QB, P):
    levels = refs[:n_levels]
    loc_ref, attn_ref, out_ref = refs[n_levels : n_levels + 3]

    acc = jnp.zeros((QB, D), jnp.float32)
    for lvl, (H, W) in enumerate(spatial_shapes):
        HW = H * W
        v = levels[lvl][0]  # (HW, D) VMEM-resident
        loc = loc_ref[0, :, lvl].astype(jnp.float32)  # (QB, P, 2)
        w_l = attn_ref[0, :, lvl].astype(jnp.float32)  # (QB, P)

        fx = loc[..., 0] * W - 0.5
        fy = loc[..., 1] * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = fx - x0
        wy = fy - y0

        # 4 corners' linear indices + weights, packed: (4, QB, P)
        lin_list, wgt_list = [], []
        for dy, wgt_y in ((0.0, 1.0 - wy), (1.0, wy)):
            for dx, wgt_x in ((0.0, 1.0 - wx), (1.0, wx)):
                xi = x0 + dx
                yi = y0 + dy
                valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
                xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
                yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
                lin_list.append(yi_c * W + xi_c)
                wgt_list.append(wgt_x * wgt_y * valid.astype(jnp.float32) * w_l)
        lin_all = jnp.concatenate([l.reshape(QB * P) for l in lin_list])  # (4*QB*P,)
        wgt_all = jnp.stack(wgt_list)  # (4, QB, P)

        # whole-array per-lane gathers (Mosaic dynamic_gather): pad the index
        # list to a multiple of HW and gather HW rows at a time
        need = 4 * QB * P
        n_g = _cdiv(need, HW)
        pad = n_g * HW - need
        if pad:
            lin_all = jnp.concatenate([lin_all, jnp.zeros((pad,), jnp.int32)])
        chunks = []
        for gi in range(n_g):
            idx = lin_all[gi * HW : (gi + 1) * HW]  # static slice
            idx2d = jnp.broadcast_to(idx[:, None], (HW, D))
            chunks.append(jnp.take_along_axis(v, idx2d, axis=0))
        g_all = jnp.concatenate(chunks, axis=0)[:need]  # (4*QB*P, D)
        g_all = g_all.reshape(4, QB, P, D).astype(jnp.float32)

        acc = acc + jnp.sum(g_all * wgt_all[..., None], axis=(0, 2))
    out_ref[0] = acc


def ms_deform_attn_pallas(
    value: jnp.ndarray,  # (B, S, M, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # (B, Lq, M, L, P, 2)
    attention_weights: jnp.ndarray,  # (B, Lq, M, L, P)
    query_block: int = 512,
) -> jnp.ndarray:
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    QB = query_block

    Lq_pad = _cdiv(Lq, QB) * QB
    pad_q = Lq_pad - Lq
    loc = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5)).reshape(B * M, Lq, L, P, 2)
    attn = jnp.transpose(attention_weights, (0, 2, 1, 3, 4)).reshape(B * M, Lq, L, P)
    if pad_q:
        loc = jnp.pad(loc, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0)), constant_values=0.5)
        attn = jnp.pad(attn, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    loc = loc.astype(jnp.float32)
    attn = attn.astype(jnp.float32)

    # per-level (B*M, HW_l, D) value arrays — f32: Mosaic dynamic_gather
    # requires index/data bitwidths to match (i32/f32)
    levels = []
    start = 0
    v = jnp.transpose(value, (0, 2, 1, 3)).reshape(B * M, S, D).astype(jnp.float32)
    for (h, w) in spatial_shapes:
        levels.append(v[:, start : start + h * w])
        start += h * w

    grid = (B * M, Lq_pad // QB)
    level_specs = [
        pl.BlockSpec((1, lv.shape[1], D), lambda bm, qb: (bm, 0, 0)) for lv in levels
    ]
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_levels=L, spatial_shapes=spatial_shapes, D=D, QB=QB, P=P
        ),
        grid=grid,
        in_specs=level_specs
        + [
            pl.BlockSpec((1, QB, L, P, 2), lambda bm, qb: (bm, qb, 0, 0, 0)),
            pl.BlockSpec((1, QB, L, P), lambda bm, qb: (bm, qb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, QB, D), lambda bm, qb: (bm, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((B * M, Lq_pad, D), jnp.float32),
    )(*levels, loc, attn)

    out = out[:, :Lq].reshape(B, M, Lq, D)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)
    return out.astype(value.dtype)


@functools.lru_cache(maxsize=8)
def _pallas_supported() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        import numpy as np

        shapes = ((8, 8), (4, 4))
        v = jnp.zeros((1, 80, 1, 8), jnp.float32)
        loc = jnp.full((1, 16, 1, 2, 2, 2), 0.5, jnp.float32)
        w = jnp.full((1, 16, 1, 2, 2), 0.25, jnp.float32)
        r = ms_deform_attn_pallas(v, shapes, loc, w, query_block=8)
        np.asarray(r)
        return True
    except Exception:
        return False


def ms_deform_attn_auto(value, spatial_shapes, sampling_locations, attention_weights):
    """Pallas kernel on TPU when it lowers, XLA composition otherwise."""
    if jax.default_backend() in ("tpu", "axon") and _pallas_supported():
        return ms_deform_attn_pallas(value, spatial_shapes, sampling_locations, attention_weights)
    return _xla_ms_deform_attn(value, spatial_shapes, sampling_locations, attention_weights)
