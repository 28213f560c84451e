"""Fused full-resolution multi-task inference (Pallas TPU kernel).

Replaces the materialized pipeline  upsample(masks) -> semantic_inference +
panoptic_inference + instance_inference  (inference/postprocess.py, specced
on reference model/oneformer_model.py:258-489) for the hot inference path.
The unfused functions remain the semantic reference (and serve consumers
that need full-resolution probability maps, e.g. semantic TTA).

Why fused: at 1024x2048 with 150 queries the unfused pipeline materializes
many (Q, H, W) tensors in HBM (upsampled logits, sigmoids, probability
maps, winner/binary masks) — ~45 ms of a ~170 ms frame. This kernel reads
the (Q, H/4, W/4) mask logits once per row-band and computes every
reduction and per-pixel map in VMEM.

Key structure: the reference's F.interpolate(scale_factor=4,
align_corners=False) decomposes into 16 *phases* — out[4k+jy, 4l+jx] is a
fixed-weight blend of src[k+dy, l+dx] for dy,dx in {0,1} with weights
depending only on (jy, jx) (source coords (r+0.5)/4 - 0.5, edges clamped =
edge-replicated padding). Each phase plane is computed with static shifts
and scalar weights — no lane gathers, which Mosaic does not have. Per-pixel
outputs are emitted phase-separated as (4, 4, H/4, W/4) and de-interleaved
by one cheap XLA transpose+reshape outside the kernel.

Mosaic notes that shaped this kernel:
  * layout is (rows, Q, cols) = (batch, sublane, lane); no reshapes cross
    the sublane/lane boundary (unsupported shape casts);
  * no vector bools: broadcast i1 relayouts fail ("non-singleton dimension
    replicated"), so every mask is 0/1 float arithmetic (sign/clip);
  * the 16 phases are a GRID dimension, not an unrolled python loop — the
    fully unrolled body made Mosaic compile for tens of minutes; phase
    constants are arithmetic in program_id so one body serves all phases;
  * DMA slices must be lane-aligned (source cols padded to 128).

Per-pixel outputs (u8 — labels <= K and ids <= Q both fit, and 3x i32 maps
overflowed the v5e AOT compiler's 16 MiB scoped-vmem output placement):
semantic argmax, and the panoptic winner id gated by its binary bit (the
sentinel Q marks no-winner pixels). Per-query accumulators: winner area, binary area, sigmoid-sum inside
the binary mask, and binary-mask bounding boxes. The per-query panoptic
bookkeeping (overlap filtering, stuff merging, id assignment) runs in XLA
on (Q,) vectors; the final id map is a fused broadcast-compare-reduce.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 4x torch bilinear (align_corners=False): out row 4k+j samples src row
# k + (j+0.5)/4 - 0.5, i.e. rows (k-1, k) for j in (0,1) and (k, k+1) for
# j in (2,3); the first-row weight is (0.375, 0.125, 0.875, 0.625)[j].
# With the +1 shift into the edge-replicated padded source both become
# arithmetic in j:  row offset = j // 2,  w0 = 0.375 + (j//2)*0.5 - (j%2)*0.25


def _fused_kernel(
    scores_ref,  # (2, Qp) f32 — row 0: where(drop, 0, score); row 1: where(drop, -1, 0)
    clsprob_ref,  # (Kp, Qp) f32 — softmax class probabilities (padded)
    masks_ref,  # (hp, Qp, wp) bf16 — edge-padded, (rows, Q, cols) layout
    sem_ref,  # out block (1, 1, bh, w) u8 — semantic argmax (labels <= K < 256)
    ids_ref,  # out block (1, 1, bh, w) u8 — winner id where its binary bit
    #           is set, else the sentinel q_real (matches no query downstream,
    #           so the former separate winner-binary output is folded in here)
    win_area_ref,  # out (1, Qp) f32
    bin_area_ref,  # out (1, Qp) f32
    final_area_ref,  # out (1, Qp) f32
    sig_sum_ref,  # out (1, Qp) f32
    strict_area_ref,  # out (1, Qp) f32 — strict (> 0) area, instance path
    box_ref,  # out (4, Qp) f32 [xmin, ymin, xmax, ymax]
    band_ref,  # scratch (bh + 2, Qp, wp) bf16
    dma_sem,
    *,
    bh: int,
    w: int,
    Qp: int,
    Kp: int,
    q_real: int,
):
    band = pl.program_id(0)
    phase = pl.program_id(1)
    jy = phase // 4
    jx = phase - jy * 4

    @pl.when((band == 0) & (phase == 0))
    def _init():
        win_area_ref[:] = jnp.zeros_like(win_area_ref)
        bin_area_ref[:] = jnp.zeros_like(bin_area_ref)
        final_area_ref[:] = jnp.zeros_like(final_area_ref)
        sig_sum_ref[:] = jnp.zeros_like(sig_sum_ref)
        strict_area_ref[:] = jnp.zeros_like(strict_area_ref)
        box_ref[0, :] = jnp.full((Qp,), 1e9, jnp.float32)
        box_ref[1, :] = jnp.full((Qp,), 1e9, jnp.float32)
        box_ref[2, :] = jnp.full((Qp,), -1e9, jnp.float32)
        box_ref[3, :] = jnp.full((Qp,), -1e9, jnp.float32)

    # DMA the source band (bh + 2 padded rows) once; phases reuse it
    @pl.when(phase == 0)
    def _load():
        copy = pltpu.make_async_copy(
            masks_ref.at[pl.ds(band * bh, bh + 2), :, :], band_ref, dma_sem
        )
        copy.start()
        copy.wait()

    # phase constants (arithmetic in the traced phase ids; all values are
    # exactly representable in bf16)
    r0 = jy // 2
    wy0 = (0.375 + (jy // 2).astype(jnp.float32) * 0.5
           - (jy % 2).astype(jnp.float32) * 0.25)
    c0f = (jx // 2).astype(jnp.float32)
    wx0 = (0.375 + (jx // 2).astype(jnp.float32) * 0.5
           - (jx % 2).astype(jnp.float32) * 0.25)

    rows0 = band_ref[pl.ds(r0, bh)]  # (bh, Qp, wp)
    rows1 = band_ref[pl.ds(r0 + 1, bh)]

    # column base c0 in {0, 1}: blend the two static lane slices with the
    # 0/1 scalar (no dynamic lane slicing, no booleans). All scalar math in
    # f32 (Mosaic cannot legalize scalar bf16 arithmetic), cast at use.
    c0b = c0f.astype(jnp.bfloat16)
    c1b = (1.0 - c0f).astype(jnp.bfloat16)

    def xsel(rows):
        a = rows[:, :, 0:w] * c1b + rows[:, :, 1 : 1 + w] * c0b
        b = rows[:, :, 1 : 1 + w] * c1b + rows[:, :, 2 : 2 + w] * c0b
        return a, b

    a00, a01 = xsel(rows0)
    a10, a11 = xsel(rows1)

    # y-axis first then x-axis with x0*(1-f) + x1*f association — matches
    # ops/resize.py's separable bf16 passes
    wy0b = wy0.astype(jnp.bfloat16)
    wy1b = (1.0 - wy0).astype(jnp.bfloat16)
    wx0b = wx0.astype(jnp.bfloat16)
    wx1b = (1.0 - wx0).astype(jnp.bfloat16)
    by0 = a00 * wy0b + a10 * wy1b
    by1 = a01 * wy0b + a11 * wy1b
    logit = by0 * wx0b + by1 * wx1b  # (bh, Qp, w) bf16

    logit32 = logit.astype(jnp.float32)
    sig = jax.nn.sigmoid(logit32)  # (bh, Qp, w) f32
    # 0/1 float bits instead of bool tensors (broadcast i1 relayouts fail).
    # Panoptic binarizes at sigmoid >= 0.5 i.e. logit >= 0 (sign(0)=0 -> 1);
    # instance binarizes STRICTLY at logit > 0 (reference mask_pred > 0) —
    # the two differ exactly on zero logits, so both bits are kept.
    bin_f = jnp.clip(jnp.sign(logit32) + 1.0, 0.0, 1.0)  # step(x >= 0)
    bins_f = jnp.clip(jnp.sign(logit32), 0.0, 1.0)  # step(x > 0)

    # ---- semantic: (bh, Kp, Qp) @ (bh, Qp, w) -> (bh, Kp, w)
    cls_b = jnp.broadcast_to(clsprob_ref[:][None], (bh, Kp, Qp))
    sem_scores = jax.lax.dot_general(
        cls_b, sig,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    sem_ref[0, 0] = jnp.argmax(sem_scores, axis=1).astype(jnp.uint8)

    # ---- panoptic winner; dropped/padded queries get exactly -1 like the
    # unfused prob_masks (-1 ties decide the winner at all-dropped pixels,
    # which feeds the areas). The drop logic is precomputed per query as
    # (gated score, additive offset): prob = sig * ks + off — 2 big-array
    # ops instead of the former sign/clip/blend chain.
    ks_b = jnp.broadcast_to(scores_ref[0, :][None, :, None], (bh, Qp, w))
    off_b = jnp.broadcast_to(scores_ref[1, :][None, :, None], (bh, Qp, w))
    prob = sig * ks_b + off_b
    ids = jnp.argmax(prob, axis=1).astype(jnp.int32)  # (bh, w)
    ids_b = jnp.broadcast_to(ids[:, None, :], (bh, Qp, w))
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (bh, Qp, w), 1)
    win_f = (1 - jnp.minimum(jnp.abs(ids_b - q_iota), 1)).astype(jnp.float32)
    winbin_f = win_f * bin_f
    # store the winner id only where the winner's binary bit is set; the
    # sentinel q_real matches no query in the downstream id-map compare, so
    # no separate winner-binary map is needed. Value range: every stored id
    # is <= Q <= 255 (enforced by the ValueError below), so u8 is lossless.
    # Motivation: u8 outputs keep the per-pixel maps small enough that XLA's
    # VMEM output placement stays under the 16 MiB scoped-vmem limit (3x i32
    # maps blew it on the v5e AOT compiler) and quarter the HBM writes.
    wb_i = jnp.max(winbin_f, axis=1).astype(jnp.int32)  # (bh, w) 0/1
    ids_ref[0, 0] = (ids * wb_i + q_real * (1 - wb_i)).astype(jnp.uint8)

    # ---- per-query accumulators
    win_area_ref[0, :] += jnp.sum(win_f, axis=(0, 2))
    bin_area_ref[0, :] += jnp.sum(bin_f, axis=(0, 2))
    final_area_ref[0, :] += jnp.sum(winbin_f, axis=(0, 2))
    sig_sum_ref[0, :] += jnp.sum(sig * bins_f, axis=(0, 2))
    strict_area_ref[0, :] += jnp.sum(bins_f, axis=(0, 2))

    # ---- boxes: global pixel coords, arithmetic masking (empty masks give
    # +/-1e9, gated by bin_area in the epilogue). The coordinate grids are
    # constant along one axis each, so the reduction factors: first reduce
    # bin_f along that axis (one big-array pass), then do the coord
    # arithmetic on the small (Qp, w) / (bh, Qp) faces — replaces 12
    # big-array passes with 2.
    anyc = jnp.max(bins_f, axis=0)  # (Qp, w)
    anyr = jnp.max(bins_f, axis=2)  # (bh, Qp)
    colf = (
        jax.lax.broadcasted_iota(jnp.int32, (Qp, w), 1) * 4 + jx
    ).astype(jnp.float32)
    rowf = (
        (jax.lax.broadcasted_iota(jnp.int32, (bh, Qp), 0) + band * bh) * 4 + jy
    ).astype(jnp.float32)
    penc = (1.0 - anyc) * jnp.float32(1e9)
    penr = (1.0 - anyr) * jnp.float32(1e9)
    box_ref[0, :] = jnp.minimum(box_ref[0, :], jnp.min(colf + penc, axis=1))
    box_ref[1, :] = jnp.minimum(box_ref[1, :], jnp.min(rowf + penr, axis=0))
    box_ref[2, :] = jnp.maximum(box_ref[2, :], jnp.max(colf - penc, axis=1))
    box_ref[3, :] = jnp.maximum(box_ref[3, :], jnp.max(rowf - penr, axis=0))


def _deinterleave(phases: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(4, 4, H/4, W/4) -> (H, W): out[4k+jy, 4l+jx] = phases[jy, jx, k, l]."""
    return phases.transpose(2, 0, 3, 1).reshape(H, W)


def deinterleave_phases_np(m: np.ndarray) -> np.ndarray:
    """Host-side wire decode: (4, 4, h, w) phase layout -> (4h, 4w)."""
    _, _, h, w = m.shape
    return np.ascontiguousarray(m.transpose(2, 0, 3, 1).reshape(4 * h, 4 * w))


@functools.partial(
    jax.jit,
    static_argnames=("object_mask_threshold", "overlap_threshold", "topk",
                     "interpret", "phase_layout"),
)
def fused_multitask_inference(
    mask_cls: jnp.ndarray,  # (Q, K+1) logits
    mask_pred: jnp.ndarray,  # (Q, h, w) mask logits (stride-4)
    thing_mask: jnp.ndarray,  # (K,) bool
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
    topk: int = 150,
    interpret: bool = False,
    phase_layout: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Returns the union of semantic/panoptic/instance outputs at 4x the
    mask resolution, numerically matching the unfused pipeline
    (semantic argmax; panoptic map + segment arrays; instance scores,
    labels, boxes, query indices — instance *masks* are derivable on demand
    and are not materialized here)."""
    Q, Kp1 = mask_cls.shape
    K = Kp1 - 1
    # The wire format downcasts the semantic/panoptic maps to uint8 below
    # (labels <= K, segment ids <= Q). That is only lossless while both fit;
    # fail loudly instead of wrapping when a config grows past 255 (e.g. a
    # >255-class dataset or topk/Q >= 256).
    if Q > 255 or K > 255:
        raise ValueError(
            f"fused_multitask_inference uint8 wire format requires Q <= 255 "
            f"and num_classes <= 255; got Q={Q}, K={K}"
        )
    h, w = mask_pred.shape[1], mask_pred.shape[2]
    H, W = 4 * h, 4 * w

    f32 = jnp.float32
    probs = jax.nn.softmax(mask_cls.astype(f32), axis=-1)
    scores_all = probs.max(axis=-1)
    labels_all = probs.argmax(axis=-1)
    keep = (labels_all != K) & (scores_all > object_mask_threshold)
    # dropped queries get score -1 so they never win the argmax (mirrors
    # prob_masks = -1 in the unfused pipeline)
    kscores = jnp.where(keep, scores_all, -1.0)

    Qp = ((Q + 7) // 8) * 8
    Kp = ((K + 7) // 8) * 8
    # src rows per band. 8, not 16: the kernel keeps several (bh, Qp, w) f32
    # intermediates live at once, and Mosaic spills them to its VMEM stack —
    # at bh=16 the frame is ~19.5 MiB, over the v5e AOT compiler's 16 MiB
    # scoped-vmem limit (compile fails with "Ran out of memory in memory
    # space vmem while allocating on stack"). bh=8 halves the frame.
    bh = 8
    assert h % bh == 0, (h, bh)
    n_bands = h // bh

    # edge-replicated padding (realizes torch's coordinate clamping), then
    # (rows, Q, cols) layout; cols padded to a lane-aligned width for DMA
    mp = jnp.pad(mask_pred.astype(jnp.bfloat16), ((0, Qp - Q), (1, 1), (1, 1)), mode="edge")
    # padded queries: logits -> -inf-ish so sig=0, binm=False
    if Qp > Q:
        mp = mp.at[Q:].set(jnp.bfloat16(-30000.0))
    mp = jnp.transpose(mp, (1, 0, 2))  # (h+2, Qp, w+2)
    wp = ((w + 2 + 127) // 128) * 128
    mp = jnp.pad(mp, ((0, 0), (0, 0), (0, wp - (w + 2))))

    cls_prob = jnp.zeros((Kp, Qp), f32)
    cls_prob = cls_prob.at[:K, :Q].set(probs[:, :-1].T)
    # row 0: multiplicative score (0 for dropped/padded); row 1: additive
    # offset (-1 for dropped/padded) — prob = sig * ks + off in-kernel
    kscores_p = jnp.full((1, Qp), -2.0, f32).at[0, :Q].set(kscores)
    kvec = jnp.concatenate(
        [jnp.where(kscores_p < 0, 0.0, kscores_p), jnp.where(kscores_p < 0, -1.0, 0.0)],
        axis=0,
    )  # (2, Qp)

    grid = (n_bands, 16)
    out_shape = [
        jax.ShapeDtypeStruct((4, 4, h, w), jnp.uint8),  # sem phases
        jax.ShapeDtypeStruct((4, 4, h, w), jnp.uint8),  # ids phases (Q = no winner)
        jax.ShapeDtypeStruct((1, Qp), f32),
        jax.ShapeDtypeStruct((1, Qp), f32),
        jax.ShapeDtypeStruct((1, Qp), f32),
        jax.ShapeDtypeStruct((1, Qp), f32),
        jax.ShapeDtypeStruct((1, Qp), f32),
        jax.ShapeDtypeStruct((4, Qp), f32),
    ]

    def phase_map(i, p):
        return (p // 4, p % 4, i, 0)

    kern = functools.partial(_fused_kernel, bh=bh, w=w, Qp=Qp, Kp=Kp, q_real=Q)
    (
        sem_ph, ids_ph, win_area, bin_area, final_area, sig_sum,
        strict_area, box,
    ) = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scores (2, Qp)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # clsprob (Kp, Qp)
            pl.BlockSpec(memory_space=pltpu.ANY),  # masks (DMA'd)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bh, w), phase_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bh, w), phase_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp), lambda i, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp), lambda i, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp), lambda i, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp), lambda i, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp), lambda i, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Qp), lambda i, p: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((bh + 2, Qp, wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(kvec, cls_prob, mp)

    # ---------------------------------------------- per-query panoptic logic
    win_area = win_area[0, :Q]
    bin_area = bin_area[0, :Q]
    final_area = final_area[0, :Q]
    sig_sum = sig_sum[0, :Q]
    strict_area = strict_area[0, :Q]

    ratio = win_area / jnp.maximum(bin_area, 1.0)
    valid = (
        keep
        & (win_area > 0)
        & (bin_area > 0)
        & (final_area > 0)
        & (ratio >= overlap_threshold)
    )
    q_idx = jnp.arange(Q)
    safe_labels = jnp.clip(labels_all, 0, K - 1)
    isthing = thing_mask[safe_labels] & (labels_all != K)
    valid_stuff = valid & ~isthing
    same_label = labels_all[:, None] == labels_all[None, :]
    earlier = q_idx[None, :] < q_idx[:, None]
    exists_earlier = jnp.any(valid_stuff[None, :] & same_label & earlier, axis=1)
    is_first_stuff = valid_stuff & ~exists_earlier
    new_segment = valid & (isthing | is_first_stuff)
    seg_id = jnp.cumsum(new_segment.astype(jnp.int32))
    stuff_id = jnp.sum(
        (is_first_stuff[None, :] & same_label).astype(jnp.int32) * seg_id[None, :], axis=1
    )
    assigned = jnp.where(isthing, seg_id, stuff_id) * valid.astype(jnp.int32)

    # final id map: winner query's assigned id where its binary bit is set —
    # fused broadcast-compare-reduce (no (Q, H, W) materialization). All
    # per-pixel math runs in the PHASE-SEPARATED (4, 4, h, w) layout: the
    # (H, W) de-interleave transpose has a minor dim of 4 (a pathological
    # TPU relayout), so it is deferred to the very end, done at u8 (every
    # map value < 256 — labels <= K, segment ids <= Q), and only for the two
    # maps that leave the function.
    pan_ph = jnp.sum(
        jnp.where(
            ids_ph[None].astype(jnp.int32) == q_idx[:, None, None, None, None],
            assigned[:, None, None, None, None],
            0,
        ),
        axis=0,
    )
    # no-winner pixels carry the sentinel id Q, which matches no q_idx above,
    # so they are already 0 — the former winner-binary multiply is gone
    panoptic_ph = pan_ph.astype(jnp.uint8)
    sem_ph_u8 = sem_ph
    if phase_layout:
        # wire layout: caller de-interleaves host-side with
        # deinterleave_phases_np (out[4k+jy, 4l+jx] = m[jy, jx, k, l])
        sem_seg = sem_ph_u8
        panoptic_seg = panoptic_ph
    else:
        sem_seg = _deinterleave(sem_ph_u8, H, W)
        panoptic_seg = _deinterleave(panoptic_ph, H, W)

    # ---------------------------------------------------- instance outputs
    flat = probs[:, :-1].reshape(-1)
    scores_per_image, topk_indices = jax.lax.top_k(flat, topk)
    labels_per_image = topk_indices % K
    q_indices = topk_indices // K
    mask_scores = sig_sum[q_indices] / (strict_area[q_indices] + 1e-6)
    # xyxy with inclusive max coords (utils/misc.masks_to_boxes convention)
    boxes = jnp.stack(
        [
            jnp.where(strict_area > 0, box[0, :Q], 0.0),
            jnp.where(strict_area > 0, box[1, :Q], 0.0),
            jnp.where(strict_area > 0, box[2, :Q], 0.0),
            jnp.where(strict_area > 0, box[3, :Q], 0.0),
        ],
        axis=-1,
    )[q_indices]

    return {
        "sem_seg_argmax": sem_seg,
        "panoptic_seg": panoptic_seg,
        "seg_id": seg_id.astype(jnp.int32),
        "label": labels_all.astype(jnp.int32),
        "isthing": isthing,
        "is_new_segment": new_segment,
        "scores": scores_per_image * mask_scores,
        "labels": labels_per_image.astype(jnp.int32),
        "boxes": boxes,
        "query_indices": q_indices.astype(jnp.int32),
    }
