"""Misc tensor utilities.

Capability spec: reference model/utils/misc.py (inverse_sigmoid, resize
wrapper), model/utils/box_ops.py (box conversions, masks_to_boxes), and
model/utils/pos_embed.py (MAE-style 2-D sin-cos position embedding +
interpolation helper).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0, 1)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


# ------------------------------------------------------------------ box ops
def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9), union


def generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    iou, union = box_iou(a, b)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-9)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) binary -> (N, 4) xyxy (reference box_ops.py:106-132);
    empty masks give zeros."""
    N, H, W = masks.shape
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    any_mask = m.sum(axis=(1, 2)) > 0
    x_max = (m * xs).max(axis=(1, 2))
    y_max = (m * ys).max(axis=(1, 2))
    big = 1e8
    x_min = jnp.where(m > 0, xs, big).min(axis=(1, 2))
    y_min = jnp.where(m > 0, ys, big).min(axis=(1, 2))
    boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_mask[:, None], boxes, 0.0)


# ---------------------------------------------------- MAE-style 2D pos embed
def get_2d_sincos_pos_embed(embed_dim: int, grid_h: int, grid_w: int, cls_token: bool = False) -> np.ndarray:
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gw = np.arange(grid_w, dtype=np.float32)
    gh = np.arange(grid_h, dtype=np.float32)
    grid = np.meshgrid(gw, gh)  # w goes first (reference pos_embed.py)
    emb_h = _1d(embed_dim // 2, grid[1])
    emb_w = _1d(embed_dim // 2, grid[0])
    pos = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim)), pos], axis=0)
    return pos.astype(np.float32)
