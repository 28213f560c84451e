"""Multi-scale deformable attention core op — TPU-native.

Behavioral spec: the reference's pure-PyTorch debug implementation
`ms_deform_attn_core_pytorch` (/root/reference/model/modeling/pixel_decoder/
ops/functions/ms_deform_attn_func.py:55-75), which is the stated numerics
contract of its CUDA kernel: per (query, head, level, point), bilinearly
sample the level's value map at the normalized sampling location
(grid_sample, zero padding, align_corners=False) and reduce with the softmax
attention weights.

TPU design
----------
The CUDA kernel is one-thread-per-(b,q,h,c) with scalar bilinear gathers. On
TPU we instead express the op as four batched corner-gathers per level
(`take_along_axis` over the flattened H*W axis) + a weighted reduction, all
with fp32 accumulation (the reference wraps this op in
`@autocast(enabled=False)`; msdeformattn.py:336 — under bf16 inference the
gathered values follow the value dtype while all weighted accumulation stays
fp32). XLA lowers the gathers to native TPU gather ops; the weighted
reduction fuses. This XLA gather formulation IS the production kernel: a
fused Pallas variant was measured slower end-to-end (Mosaic has no
cross-vreg gather, and Pallas custom calls are fusion barriers for the
surrounding layers — see BASELINE.md negative results) and was removed.

Shapes
------
  value:              (B, S, M, D)     S = sum(H_l * W_l)
  spatial_shapes:     static tuple ((H_0, W_0), ...)
  sampling_locations: (B, Lq, M, L, P, 2)  normalized [0, 1], xy order
  attention_weights:  (B, Lq, M, L, P)
  returns:            (B, Lq, M * D)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """TPU-optimized formulation: one 2x2xD patch-gather per (level, point)
    from zero-padded maps — the padding realizes grid_sample's zero padding
    exactly and keeps every gather slice contiguous.

    Two measured facts on TPU v5e shape the design (see BASELINE.md):
      1. gathers are slice-count-bound, so the whole 2x2 bilinear footprint
         is packed into ONE (1, 4D)-channel slice: the zero-padded map
         concatenated with its x+1, y+1, (y+1,x+1) shifts along channels;
      2. gather throughput is ~3.2 ns/slice when the gathered table fits in
         VMEM (XLA stages it) and ~12-13 ns/slice when it does not — so the
         (B*M)-batched single gather (68 MB table at production shapes) is
         replaced with B*M sequential per-head gathers whose 8.5 MB tables
         each stay VMEM-resident (3.5x faster end to end).
    The per-head unroll is used for small B*M (inference); large-batch
    training falls back to the batched gather to bound op count.
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert len(spatial_shapes) == L
    assert sum(h * w for h, w in spatial_shapes) == S

    orig_dtype = value.dtype
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)
    unroll_heads = B * M <= 16

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )

    out = jnp.zeros((B, M, Lq, D), jnp.float32)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        HW = H * W
        v = jnp.transpose(value[:, start : start + HW], (0, 2, 1, 3))
        v = v.reshape(B * M, H, W, D)
        v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        v = jnp.concatenate([v[:, :, :-1], v[:, :, 1:]], axis=-1)  # x-pairs
        v = jnp.concatenate([v[:, :-1], v[:, 1:]], axis=-1)  # + y-pairs
        v = v.reshape(B * M, (H + 1) * (W + 1), 4 * D)
        start += HW

        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, M, P, 2)
        fx = loc[..., 0] * W - 0.5
        fy = loc[..., 1] * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = fx - x0
        wy = fy - y0
        # patches fully outside the map contribute nothing
        inside = (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
        w_l = attention_weights[:, :, :, lvl] * inside  # (B, Lq, M, P)

        # -> (B*M, Lq*P, ...) layouts
        def bm(x):
            return jnp.transpose(x, (0, 2, 1, 3)).reshape(B * M, Lq * P)

        ix = (jnp.clip(x0, -1, W - 1) + 1).astype(jnp.int32)
        iy = (jnp.clip(y0, -1, H - 1) + 1).astype(jnp.int32)
        lin = bm(iy) * (W + 1) + bm(ix)  # (B*M, LqP) flat start of (y0, x0)

        wxb = jnp.transpose(wx, (0, 2, 1, 3))  # (B, M, Lq, P)
        wyb = jnp.transpose(wy, (0, 2, 1, 3))
        wlb = jnp.transpose(w_l, (0, 2, 1, 3))
        # corner weights in gather-channel order [y0x0, y0x1, y1x0, y1x1];
        # weighted sum via static lane-slices of the packed 4D axis — avoids
        # relayouting the big gather output into a (.., 2, 2, D) view
        corner_w = (
            (1 - wyb) * (1 - wxb),
            (1 - wyb) * wxb,
            wyb * (1 - wxb),
            wyb * wxb,
        )

        if unroll_heads:
            # per-(b, head) flat rank-2 gathers: each table <= ~8.5 MB at
            # production shapes -> VMEM-staged by XLA (~3.2 ns/slice).
            # The weighted reduction runs inside the per-head loop so the
            # (LqP, 4D) gather output fuses into its consumer instead of
            # being stacked/materialized in HBM.
            cw = [c.reshape(B, M, Lq, P) for c in corner_w]
            wl2 = wlb.reshape(B, M, Lq, P)
            acc_heads = []
            for i in range(B * M):
                b, m = divmod(i, M)
                g = jax.lax.gather(
                    v[i], lin[i][:, None], dnums, slice_sizes=(1, 4 * D),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )  # (LqP, 4D)
                g = g.reshape(Lq, P, 4 * D)
                a = jnp.zeros((Lq, D), jnp.float32)
                for c in range(4):
                    w_c = (cw[c][b, m] * wl2[b, m]).astype(g.dtype)  # (Lq, P)
                    term = g[..., c * D : (c + 1) * D] * w_c[..., None]
                    a = a + jnp.sum(term.astype(jnp.float32), axis=1)
                acc_heads.append(a)
            acc = jnp.stack(acc_heads).reshape(B, M, Lq, D)
        else:
            quads = jax.vmap(
                lambda vm, im: jax.lax.gather(
                    vm, im, dnums, slice_sizes=(1, 4 * D),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )
            )(v, lin[..., None])
            quads = quads.reshape(B, M, Lq, P, 4 * D)
            acc = jnp.zeros((B, M, Lq, D), jnp.float32)
            for c in range(4):
                w_c = (corner_w[c] * wlb).astype(quads.dtype)
                term = quads[..., c * D : (c + 1) * D] * w_c[..., None]
                acc = acc + jnp.sum(term.astype(jnp.float32), axis=3)
        out = out + acc

    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)
    return out.astype(orig_dtype)


def ms_deform_attn_corners(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert len(spatial_shapes) == L
    assert sum(h * w for h, w in spatial_shapes) == S

    orig_dtype = value.dtype
    value = value.astype(jnp.float32)
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)

    out = jnp.zeros((B, M, Lq, D), jnp.float32)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        HW = H * W
        # (B, HW, M, D) -> (B, M, HW, D)
        v = jnp.transpose(value[:, start : start + HW], (0, 2, 1, 3))
        start += HW

        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, M, P, 2)
        # grid_sample(2*loc-1, align_corners=False) source coords:
        #   fx = loc_x * W - 0.5 ; fy = loc_y * H - 0.5
        fx = loc[..., 0] * W - 0.5
        fy = loc[..., 1] * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = fx - x0
        wy = fy - y0

        w_l = attention_weights[:, :, :, lvl]  # (B, Lq, M, P)
        # (B, M, Lq, P)
        w_l = jnp.transpose(w_l, (0, 2, 1, 3))
        wx = jnp.transpose(wx, (0, 2, 1, 3))
        wy = jnp.transpose(wy, (0, 2, 1, 3))
        x0 = jnp.transpose(x0, (0, 2, 1, 3))
        y0 = jnp.transpose(y0, (0, 2, 1, 3))

        acc = jnp.zeros((B, M, Lq, D), jnp.float32)
        for dy, wgt_y in ((0.0, 1.0 - wy), (1.0, wy)):
            for dx, wgt_x in ((0.0, 1.0 - wx), (1.0, wx)):
                xi = x0 + dx
                yi = y0 + dy
                valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
                xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
                yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
                lin = (yi_c * W + xi_c).reshape(B, M, Lq * P)
                # gather rows: (B, M, Lq*P, D)
                g = jnp.take_along_axis(v, lin[..., None], axis=2)
                g = g.reshape(B, M, Lq, P, D)
                w = (wgt_x * wgt_y * valid.astype(jnp.float32) * w_l)[..., None]
                acc = acc + jnp.sum(g * w, axis=3)
        out = out + acc

    # (B, M, Lq, D) -> (B, Lq, M*D)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)
    return out.astype(orig_dtype)
