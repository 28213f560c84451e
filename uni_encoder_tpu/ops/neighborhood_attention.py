"""(Dilated) neighborhood attention — TPU-native replacement for the NATTEN
CUDA library consumed by the reference's DiNAT backbone
(model/modeling/backbone/dinat.py:14, natten==0.14.4).

Semantics (NATTEN): each query (i, j) attends to a k x k window of keys on
the dilation-d subgrid sharing its residue class; the window is *clamped* to
stay inside the feature map (it slides inward at borders, never zero-pads),
and a relative-position bias indexed by the (clamped) sub-grid offset is
added to the logits.

TPU formulation: instead of gathering a (..., k*k, C) neighborhood tensor
(bad for VMEM), we loop over the k*k static offsets; each offset is a pair
of 1-D row/col gathers of the full map (cheap XLA take) + an elementwise
multiply-reduce for the logits. Softmax runs over the stacked k*k logit
planes; the output accumulates attn * shifted-V. All indices and the
bias gather maps are static numpy constants.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _axis_indices(size: int, kernel: int, dilation: int) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (idx, rel): idx[i, a] = absolute position of the a-th window
    element for query i; rel[i, a] = bias index in [0, 2k-2]."""
    r = kernel // 2
    idx = np.zeros((size, kernel), np.int64)
    rel = np.zeros((size, kernel), np.int64)
    for i in range(size):
        m = i % dilation
        q = i // dilation
        sub_len = (size - m + dilation - 1) // dilation
        start = min(max(q - r, 0), max(sub_len - kernel, 0))
        for a in range(kernel):
            sub = min(start + a, sub_len - 1)
            idx[i, a] = sub * dilation + m
            rel[i, a] = sub - q + (kernel - 1)
    return idx, rel


def neighborhood_attention_2d(
    q: jnp.ndarray,  # (B, H, W, heads, dh) pre-scaled
    k: jnp.ndarray,  # (B, H, W, heads, dh)
    v: jnp.ndarray,  # (B, H, W, heads, dh)
    rpb: jnp.ndarray,  # (heads, 2k-1, 2k-1)
    kernel: int,
    dilation: int = 1,
) -> jnp.ndarray:
    B, H, W, nh, dh = q.shape
    idx_h, rel_h = _axis_indices(H, kernel, dilation)
    idx_w, rel_w = _axis_indices(W, kernel, dilation)

    logits = []
    for a in range(kernel):
        k_row = jnp.take(k, jnp.asarray(idx_h[:, a]), axis=1)
        for b in range(kernel):
            k_ab = jnp.take(k_row, jnp.asarray(idx_w[:, b]), axis=2)
            l = jnp.sum(q * k_ab, axis=-1, dtype=jnp.float32)  # (B, H, W, nh)
            bias = rpb[:, rel_h[:, a][:, None], rel_w[:, b][None, :]]  # (nh, H, W)
            logits.append(l + bias.transpose(1, 2, 0)[None])
    logits = jnp.stack(logits, axis=-1)  # (B, H, W, nh, k*k)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)

    out = jnp.zeros_like(q)
    i = 0
    for a in range(kernel):
        v_row = jnp.take(v, jnp.asarray(idx_h[:, a]), axis=1)
        for b in range(kernel):
            v_ab = jnp.take(v_row, jnp.asarray(idx_w[:, b]), axis=2)
            out = out + attn[..., i][..., None] * v_ab
            i += 1
    return out
