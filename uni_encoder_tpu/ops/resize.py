"""Torch-semantics image resampling ops for TPU (NHWC, static shapes).

The reference relies pervasively on `F.interpolate` (bilinear with both
align_corners settings, nearest) and `F.grid_sample` (bilinear, zero padding,
align_corners=False) — e.g. mask upsampling (oneformer_model.py:258-263),
FPN top-down paths (msdeformattn.py:375-377), TransDSSL fusion
(transdssl.py:300-302, align_corners=True), and the pure-PyTorch deformable
attention spec (ops/functions/ms_deform_attn_func.py:55-75).

These implementations reproduce PyTorch's exact coordinate conventions:

  * bilinear, align_corners=False: src = (dst + 0.5) * in/out - 0.5,
    clamped below at 0; upper corner index clipped to in-1.
  * bilinear, align_corners=True:  src = dst * (in-1)/(out-1).
  * nearest: src = floor(dst * in/out).
  * grid_sample (align_corners=False): x = ((gx + 1) * W - 1) / 2 with
    zero padding outside the image.

All resizes are separable (per-axis gathers), which XLA lowers to efficient
TPU gathers along the sublane axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return (idx0, idx1, frac) for one axis with torch bilinear semantics."""
    dst = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (dst + 0.5) * scale - 0.5
        src = jnp.maximum(src, 0.0)  # torch clamps negative source coords
    idx0 = jnp.floor(src).astype(jnp.int32)
    idx0 = jnp.clip(idx0, 0, in_size - 1)
    idx1 = jnp.minimum(idx0 + 1, in_size - 1)
    frac = src - idx0.astype(jnp.float32)
    return idx0, idx1, frac


def _resize_axis_linear(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    idx0, idx1, frac = _source_coords(out_size, in_size, align_corners)
    x0 = jnp.take(x, idx0, axis=axis)
    x1 = jnp.take(x, idx1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = frac.reshape(shape).astype(x.dtype)
    return x0 * (1 - w) + x1 * w


def _resize_axis_nearest(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = jnp.floor(dst * (in_size / out_size)).astype(jnp.int32)
    src = jnp.clip(src, 0, in_size - 1)
    return jnp.take(x, src, axis=axis)


def interpolate(
    x: jnp.ndarray,
    size: Optional[Sequence[int]] = None,
    scale_factor: Optional[float] = None,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """`F.interpolate` equivalent for NHWC (or N...HWC trailing-spatial) arrays.

    x: (B, H, W, C). `size`: (out_h, out_w).
    """
    assert x.ndim == 4, f"expected NHWC, got shape {x.shape}"
    if size is None:
        assert scale_factor is not None
        size = (int(x.shape[1] * scale_factor), int(x.shape[2] * scale_factor))
    out_h, out_w = int(size[0]), int(size[1])
    if mode == "bilinear":
        x = _resize_axis_linear(x, 1, out_h, align_corners)
        x = _resize_axis_linear(x, 2, out_w, align_corners)
        return x
    if mode == "nearest":
        x = _resize_axis_nearest(x, 1, out_h)
        x = _resize_axis_nearest(x, 2, out_w)
        return x
    raise ValueError(f"unsupported mode {mode!r}")


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """`F.grid_sample(mode='bilinear', padding_mode='zeros'|'border')` (NHWC).

    x: (B, H, W, C); grid: (B, Ho, Wo, 2) with normalized (gx, gy) in [-1, 1].
    Returns (B, Ho, Wo, C).
    """
    B, H, W, C = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5

    if padding_mode == "border":
        # torch clamps the *source coordinate* so corner weights follow
        fx = jnp.clip(fx, 0, W - 1)
        fy = jnp.clip(fy, 0, H - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    out = 0.0
    flat = x.reshape(B, H * W, C)
    for dy, wy_ in ((0.0, 1.0 - wy), (1.0, wy)):
        for dx, wx_ in ((0.0, 1.0 - wx), (1.0, wx)):
            xi = x0 + dx
            yi = y0 + dy
            if padding_mode == "zeros":
                valid = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)).astype(x.dtype)
            else:
                valid = jnp.ones_like(xi, x.dtype)
            xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            lin = yi_c * W + xi_c  # (B, Ho, Wo)
            g = jnp.take_along_axis(
                flat, lin.reshape(B, -1, 1), axis=1
            ).reshape(B, *lin.shape[1:], C)
            w = (wx_ * wy_ * valid)[..., None]
            out = out + g * w
    return out
