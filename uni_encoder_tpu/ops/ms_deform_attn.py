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
fully-fused Pallas MSDA was measured slower end-to-end (Mosaic has no
cross-vreg gather, and Pallas custom calls are fusion barriers for the
surrounding layers — see BASELINE.md negative results) and was removed.
Three Pallas/XLA restatements of the REDUCTION step (VMEM-resident corner
dots; row-major variants killing the gather-output relayout) were benched on
the real chip in round 4 and ALL LOST end-to-end (7-41% slower — the r4
decision table in BASELINE.md); they were removed. The two-dot MXU
reduction below is the measured winner.

Shapes
------
  value:              (B, S, M, D)     S = sum(H_l * W_l)
  spatial_shapes:     static tuple ((H_0, W_0), ...)
  sampling_locations: (B, Lq, M, L, P, 2)  normalized [0, 1], xy order
  attention_weights:  (B, Lq, M, L, P)
  returns:            (B, Lq, M * D)
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

@functools.lru_cache(maxsize=None)
def _reduction_mats(P: int, D: int) -> Tuple[np.ndarray, np.ndarray]:
    """Constant 0/1 matrices that turn the corner-weighted reduction into
    two MXU matmuls over the LANE axis (measured: the lane-sliced VPU
    reduction costs ~10 ms/layer at production shapes; this form ~1 ms —
    contraction over lanes is the MXU-native layout, no relayout of the
    gather output).

      E (P*4, P*4*D): expands per-(point, corner) weights to lane width,
                      E[k, k*D + i] = 1.
      S (P*4*D, D):   sums the D-wide lane groups, S[k*D + i, i] = 1.

    out(q, :) = (g(q, :) * (w16(q, :) @ E)) @ S
              = sum_{p,c} w16[q, p*4+c] * g[q, (p*4+c)*D : +D].
    """
    K = P * 4
    E = np.zeros((K, K * D), np.float32)
    S = np.zeros((K * D, D), np.float32)
    for k in range(K):
        E[k, k * D : (k + 1) * D] = 1.0
        S[k * D : (k + 1) * D] += np.eye(D, dtype=np.float32)
    return E, S


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    layout: str = "q",
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
    assert sum(h * w for h, w in spatial_shapes) == S
    L = len(spatial_shapes)

    orig_dtype = value.dtype
    # ALL per-level elementwise math runs component-major, Lq on LANES. The
    # former (B, M, Lq, P)/(…, 2) layouts put P=4 / xy=2 on lanes — 4/128
    # lane utilization — and cost a measured 6.15 ms/layer of pure VPU math
    # (tools/profile_msda_parts.py); component-major runs the identical ops
    # fully vectorized. Callers that already produce component-major tensors
    # (layout="cm": locations (B, M, L, P, 2, Lq), weights (B, M, L, P, Lq))
    # skip the relayout entirely.
    if layout in ("cm", "cm_abs"):
        # "cm_abs": locations are ABSOLUTE source coordinates fx, fy (the
        # grid_sample map loc*W - 0.5 already applied by the caller, who
        # folds it into the reference-point constants — the reference's
        # offsets/wh normalization and the op's *W rescale cancel exactly;
        # see MSDeformAttnLayer).
        _, _, Ls, P, _, Lq = sampling_locations.shape
        assert Ls == L and attention_weights.shape[2] == L, (
            f"level axis {Ls}/{attention_weights.shape[2]} != len(spatial_shapes) {L}"
        )
        sampling_locations = sampling_locations.astype(jnp.float32)
        attention_weights = attention_weights.astype(jnp.float32)
    else:
        _, Lq, _, Ls, P, _ = sampling_locations.shape
        assert Ls == L and attention_weights.shape[3] == L, (
            f"level axis {Ls}/{attention_weights.shape[3]} != len(spatial_shapes) {L}"
        )
        sampling_locations = jnp.transpose(
            sampling_locations.astype(jnp.float32), (0, 2, 3, 4, 5, 1)
        )  # (B, M, L, P, 2, Lq)
        attention_weights = jnp.transpose(
            attention_weights.astype(jnp.float32), (0, 2, 3, 4, 1)
        )  # (B, M, L, P, Lq)
    unroll_heads = B * M <= 16

    # MSDA_GATHER_SPLIT=n splits each per-head gather into n row-chunks
    # (identical slices, more independent ops for the scheduler to overlap
    # with VPU/MXU work — the isolated microbench runs at ~1.9 ns/slice vs
    # ~2.6 in the production op; this knob tests whether extra gather-level
    # parallelism closes that gap end-to-end). Default 1 = single gather.
    _gsplit = int(os.environ.get("MSDA_GATHER_SPLIT", "1"))
    # MSDA_LOC_PER_HEAD=1 computes each head's index/weight math inside the
    # per-head loop instead of one batched block before all gathers — the
    # ~2 ms/layer of loc math is the only VPU work with no data dependence
    # on the gathers, so emitting it per head lets the scheduler overlap
    # head i+1's loc math with head i's (scalar-unit-bound) gathers.
    _loc_ph = os.environ.get("MSDA_LOC_PER_HEAD") == "1"
    # MSDA_TABLE_PER_HEAD=1 builds each head's packed corner table inside
    # the per-head loop (8 small pad+concat chains instead of one batched
    # one per level): gather i then waits only on build i, and build i+1
    # can overlap gather i — targets the ~0.8 ms/layer of exposed build.
    _tbl_ph = os.environ.get("MSDA_TABLE_PER_HEAD") == "1"
    # MSDA_PMAJOR=1: point-major gather order. The q-major index vector
    # needs a (P, Lq) -> (Lq*P,) interleave relayout on every gather's
    # critical path; emitting one gather per sampling POINT (index = a free
    # reshape of the lane-major (P, Lq) row) kills that relayout and yields
    # P independent gather->reduce chains per head-level with zero producer
    # relayouts (weights stay component-major; the E-dot streams them
    # transposed via dot_general). Subsumes/ignores MSDA_GATHER_SPLIT.
    _pmajor = os.environ.get("MSDA_PMAJOR") == "1"
    # MSDA_W16_DG=1 (unrolled-heads path only): keep w16 component-major
    # (P*4, Lq) and let dot_general contract its dim 0 against E — the MXU
    # streams the transposed operand, so the explicit (P*4, Lq) -> (Lq, P*4)
    # relayout disappears (profile_msda_parts: dg cm-w16 12.74 vs 12.93 ms).
    _w16_dg = os.environ.get("MSDA_W16_DG") == "1" and unroll_heads

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )

    value_hm = jnp.transpose(value, (0, 2, 1, 3))  # (B, M, S, D), one relayout

    out = jnp.zeros((B, M, Lq, D), jnp.float32)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        HW = H * W
        s0 = start
        start += HW
        _tbl_ph_active = _tbl_ph and unroll_heads
        if not _tbl_ph_active:
            v = value_hm[:, :, s0 : s0 + HW].reshape(B * M, H, W, D)
            vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
            # ONE 4-operand concat (measured 2.85 vs 4.87 ms/layer for the
            # two-stage x-pairs/y-pairs concat). NOTE (r3, profile_msda_parts):
            # in the full op the table build overlaps the scalar-unit-bound
            # gathers almost completely (full op 16.93 ms/layer vs 16.14 with
            # prebuilt tables) — build variants (im2col patches, flat-stride,
            # Pallas DMA packer) cannot win more than ~0.8 ms/layer and all
            # measured neutral-to-worse in context; see BASELINE.md.
            v = jnp.concatenate(
                [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]],
                axis=-1,
            )
            v = v.reshape(B * M, (H + 1) * (W + 1), 4 * D)

        _tb_cache = {}

        def head_table(i):
            # packed corner table for head i: a slice of the batched build,
            # or (table-per-head knob) its own pad+concat chain so the
            # scheduler can overlap it with the previous head's gathers
            if not _tbl_ph_active:
                return v[i]
            if i not in _tb_cache:
                b, m = divmod(i, M)
                vi = value_hm[b, m, s0 : s0 + HW].reshape(H, W, D)
                vip = jnp.pad(vi, ((1, 1), (1, 1), (0, 0)))
                vi4 = jnp.concatenate(
                    [vip[:-1, :-1], vip[:-1, 1:], vip[1:, :-1], vip[1:, 1:]],
                    axis=-1,
                )
                _tb_cache[i] = vi4.reshape((H + 1) * (W + 1), 4 * D)
            return _tb_cache[i]

        loc = sampling_locations[:, :, lvl]  # (B, M, P, 2, Lq)
        _pmajor_active = _pmajor and unroll_heads
        _loc_ph_active = (_loc_ph and unroll_heads) or _pmajor_active
        if not _loc_ph_active:
            if layout == "cm_abs":
                fx = loc[:, :, :, 0]  # (B, M, P, Lq) — Lq on lanes
                fy = loc[:, :, :, 1]
            else:
                fx = loc[:, :, :, 0] * W - 0.5
                fy = loc[:, :, :, 1] * H - 0.5
            x0 = jnp.floor(fx)
            y0 = jnp.floor(fy)
            wxb = fx - x0  # (B, M, P, Lq)
            wyb = fy - y0
            # patches fully outside the map contribute nothing
            inside = (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
            wlb = attention_weights[:, :, lvl] * inside  # (B, M, P, Lq)

            ix = (jnp.clip(x0, -1, W - 1) + 1).astype(jnp.int32)
            iy = (jnp.clip(y0, -1, H - 1) + 1).astype(jnp.int32)
            # gather wants q-major (Lq*P) index rows: one int relayout/level
            lin = (iy * (W + 1) + ix)  # (B, M, P, Lq)
            lin = jnp.transpose(lin, (0, 1, 3, 2)).reshape(B * M, Lq * P)
            # per-(point, corner) weights in gather-channel order
            # [y0x0, y0x1, y1x0, y1x1], folded with the attention weight;
            # built component-major as (B, M, P, 4, Lq) then relayed out once
            # to the (B, M, Lq, P*4) rows the MXU reduction consumes
            # (k = p*4 + c)
            w16 = jnp.stack(
                [
                    (1 - wyb) * (1 - wxb),
                    (1 - wyb) * wxb,
                    wyb * (1 - wxb),
                    wyb * wxb,
                ],
                axis=3,
            ) * wlb[:, :, :, None]  # (B, M, P, 4, Lq)
            w16 = w16.reshape(B, M, P * 4, Lq)
            if not _w16_dg:
                # q-major rows for the plain-dot reduction; the dg form
                # keeps this component-major and skips the relayout
                w16 = jnp.transpose(w16, (0, 1, 3, 2))

        def loc_head(i):
            # per-head loc math (same algebra as the batched block above,
            # leading (B, M) axes sliced away): (Lq*P,) indices + (Lq, P*4)
            # reduction-order weights for head i
            b, m = divmod(i, M)
            if layout == "cm_abs":
                fxh = loc[b, m, :, 0]  # (P, Lq)
                fyh = loc[b, m, :, 1]
            else:
                fxh = loc[b, m, :, 0] * W - 0.5
                fyh = loc[b, m, :, 1] * H - 0.5
            x0h = jnp.floor(fxh)
            y0h = jnp.floor(fyh)
            wxh = fxh - x0h
            wyh = fyh - y0h
            insh = (x0h >= -1) & (x0h <= W - 1) & (y0h >= -1) & (y0h <= H - 1)
            wlh = attention_weights[b, m, lvl] * insh  # (P, Lq)
            ixh = (jnp.clip(x0h, -1, W - 1) + 1).astype(jnp.int32)
            iyh = (jnp.clip(y0h, -1, H - 1) + 1).astype(jnp.int32)
            linh = jnp.swapaxes(iyh * (W + 1) + ixh, 0, 1).reshape(Lq * P)
            w16h = jnp.stack(
                [
                    (1 - wyh) * (1 - wxh),
                    (1 - wyh) * wxh,
                    wyh * (1 - wxh),
                    wyh * wxh,
                ],
                axis=1,
            ) * wlh[:, None]  # (P, 4, Lq)
            w16h = w16h.reshape(P * 4, Lq)
            if not _w16_dg:
                w16h = jnp.swapaxes(w16h, 0, 1)
            return linh, w16h

        def loc_head_pmajor(i):
            # point-major producers for head i: indices (P, Lq) — row p is
            # the p-th point's gather rows, flat reshape is FREE (lane-major,
            # no q-interleave) — and component-major corner weights
            # (P, 4, Lq); same algebra as loc_head otherwise
            b, m = divmod(i, M)
            if layout == "cm_abs":
                fxh = loc[b, m, :, 0]  # (P, Lq)
                fyh = loc[b, m, :, 1]
            else:
                fxh = loc[b, m, :, 0] * W - 0.5
                fyh = loc[b, m, :, 1] * H - 0.5
            x0h = jnp.floor(fxh)
            y0h = jnp.floor(fyh)
            wxh = fxh - x0h
            wyh = fyh - y0h
            insh = (x0h >= -1) & (x0h <= W - 1) & (y0h >= -1) & (y0h <= H - 1)
            wlh = attention_weights[b, m, lvl] * insh  # (P, Lq)
            ixh = (jnp.clip(x0h, -1, W - 1) + 1).astype(jnp.int32)
            iyh = (jnp.clip(y0h, -1, H - 1) + 1).astype(jnp.int32)
            linp = iyh * (W + 1) + ixh  # (P, Lq)
            w4cm = jnp.stack(
                [
                    (1 - wyh) * (1 - wxh),
                    (1 - wyh) * wxh,
                    wyh * (1 - wxh),
                    wyh * wxh,
                ],
                axis=1,
            ) * wlh[:, None]  # (P, 4, Lq)
            return linp, w4cm

        _ph_cache = {}

        def head_lw(i):
            # (indices, weights) for head i: per-head math when the loc
            # overlap knob is on, slices of the batched block otherwise
            if _loc_ph_active:
                if i not in _ph_cache:
                    _ph_cache[i] = loc_head(i)
                return _ph_cache[i]
            b, m = divmod(i, M)
            return lin[i], w16[b, m]

        E_np, S_np = _reduction_mats(P, D)
        g_dtype = value_hm.dtype
        E_m = jnp.asarray(E_np, g_dtype)
        S_m = jnp.asarray(S_np, g_dtype)

        def reduce_rows(g_rows, w_rows):
            # g_rows (N, P*4*D), w_rows (N, P*4) -> (N, D) f32. The f32->bf16
            # cast fuses into the dot read; transposing w16 at bf16 instead
            # is NOT a win (sub-word relayout penalty). Under MSDA_W16_DG,
            # w_rows arrives COMPONENT-major (P*4, N) and dot_general
            # contracts its dim 0 — the MXU streams the transposed operand,
            # no explicit relayout.
            if _w16_dg:
                wrow = jax.lax.dot_general(
                    w_rows.astype(g_dtype), E_m,
                    (((0,), (0,)), ((), ())), preferred_element_type=g_dtype,
                )
            else:
                wrow = jnp.dot(
                    w_rows.astype(g_dtype), E_m, preferred_element_type=g_dtype
                )
            return jnp.dot(g_rows * wrow, S_m, preferred_element_type=jnp.float32)

        if unroll_heads:
            # per-(b, head) flat rank-2 gathers: each table <= ~8.5 MB at
            # production shapes -> VMEM-staged by XLA; the MXU reduction
            # consumes the (Lq, P*4D) gather output in place.
            if _pmajor_active:
                # point-major: P independent gather->reduce chains per head,
                # index rows are free reshapes of the lane-major (P, Lq)
                # producer output (no q-interleave relayout anywhere)
                E4_np, S4_np = _reduction_mats(1, D)  # (4, 4D), (4D, D)
                E4 = jnp.asarray(E4_np, g_dtype)
                S4 = jnp.asarray(S4_np, g_dtype)
                _pm_cache = {}

                def head_pm(i):
                    if i not in _pm_cache:
                        _pm_cache[i] = loc_head_pmajor(i)
                    return _pm_cache[i]

                def point_part(i, p):
                    linp, w4cm = head_pm(i)
                    g = jax.lax.gather(
                        head_table(i), linp[p][:, None], dnums,
                        slice_sizes=(1, 4 * D),
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                    )  # (Lq, 4D)
                    # (4, Lq)^T @ (4, 4D) -> (Lq, 4D): MXU streams the
                    # transposed weight operand, no relayout
                    wrow = jax.lax.dot_general(
                        w4cm[p].astype(g_dtype), E4,
                        (((0,), (0,)), ((), ())), preferred_element_type=g_dtype,
                    )
                    return jnp.dot(g * wrow, S4, preferred_element_type=jnp.float32)

                acc_heads = [
                    sum(point_part(i, p) for p in range(P))
                    for i in range(B * M)
                ]
            elif _gsplit > 1 and Lq % _gsplit == 0:
                # query-granular chunks: each chunk's gather feeds its own
                # reduction (identical slices/rows to the single gather),
                # so only the (Lq/n, D) outputs are concatenated — not the
                # 32x larger raw gather chunks — while the scheduler gets
                # n independent gather ops to overlap with VPU/MXU work
                cq = Lq // _gsplit
                c = cq * P

                def chunk(i, s):
                    lin_i, w16_i = head_lw(i)
                    w_chunk = (w16_i[:, s * cq : (s + 1) * cq] if _w16_dg
                               else w16_i[s * cq : (s + 1) * cq])
                    return reduce_rows(
                        jax.lax.gather(
                            head_table(i), lin_i[s * c : (s + 1) * c][:, None],
                            dnums, slice_sizes=(1, 4 * D),
                            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                        ).reshape(cq, P * 4 * D),
                        w_chunk,
                    )

                # emission order is NOT a lever: interleaving chunk s of
                # every head before chunk s+1 measured exactly neutral
                # (7.701 vs 7.700 img/s, r5) — XLA's latency-hiding
                # scheduler reorders the independent chains itself
                acc_heads = [
                    jnp.concatenate([chunk(i, s) for s in range(_gsplit)])
                    for i in range(B * M)
                ]
            else:
                acc_heads = []
                for i in range(B * M):
                    lin_i, w16_i = head_lw(i)
                    g = jax.lax.gather(
                        head_table(i), lin_i[:, None], dnums,
                        slice_sizes=(1, 4 * D),
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                    )  # (LqP, 4D)
                    acc_heads.append(
                        reduce_rows(g.reshape(Lq, P * 4 * D), w16_i)
                    )
            acc = jnp.stack(acc_heads).reshape(B, M, Lq, D)
        else:
            quads = jax.vmap(
                lambda vm, im: jax.lax.gather(
                    vm, im, dnums, slice_sizes=(1, 4 * D),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )
            )(v, lin[..., None])
            acc = reduce_rows(
                quads.reshape(B * M * Lq, P * 4 * D),
                w16.reshape(B * M * Lq, P * 4),
            ).reshape(B, M, Lq, D)
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
