"""In-context decomposition of the ms_deform_attn op cost on the real chip.

Times, with the trusted lax.scan harness (tools/profile_stages.py::timed):
  full op        — production ms_deform_attn at seg-forward shapes
  tables only    — the packed corner-table build for all 3 levels
  gather+reduce  — the op with PREBUILT tables as inputs (isolates the
                   per-head gathers + MXU corner reduction + loc math)
  loc+w16 only   — sampling-location/corner-weight math without gathers

This separates "structural floor" (gathers) from "removable" (table build)
without the dispatch-floor noise of tools/bench_table_build.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uni_encoder_tpu.utils.cache import probe_axon_relay, setup_compile_cache

probe_axon_relay()

setup_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_stages import timed  # noqa: E402
from uni_encoder_tpu.ops.ms_deform_attn import ms_deform_attn, _reduction_mats  # noqa: E402

B, M, D, P = 1, 8, 32, 4
SHAPES = ((128, 256), (64, 128), (32, 64))
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)
Lq = S


def build_tables(value):
    value_hm = jnp.transpose(value, (0, 2, 1, 3))
    tables = []
    start = 0
    for H, W in SHAPES:
        HW = H * W
        v = value_hm[:, :, start : start + HW].reshape(B * M, H, W, D)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        t = jnp.concatenate(
            [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]],
            axis=-1,
        )
        tables.append(t.reshape(B * M, (H + 1) * (W + 1), 4 * D))
        start += HW
    return tables


def build_tables_patches(value):
    """Production build since r3: im2col patches (channel-major rows)."""
    value_hm = jnp.transpose(value, (0, 2, 1, 3))
    tables = []
    start = 0
    for H, W in SHAPES:
        HW = H * W
        v = value_hm[:, :, start : start + HW].reshape(B * M, H, W, D)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        t = jax.lax.conv_general_dilated_patches(
            vp, (2, 2), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        tables.append(t.reshape(B * M, (H + 1) * (W + 1), 4 * D))
        start += HW
    return tables


def loc_w16(loc_cm, w_cm):
    """Mirror of the PRODUCTION component-major cm_abs loc math
    (ops/ms_deform_attn.py level loop): loc_cm (B, M, L, P, 2, Lq) absolute
    coords, w_cm (B, M, L, P, Lq). Returns per-level q-major (lin, w16)."""
    outs = []
    for lvl, (H, W) in enumerate(SHAPES):
        loc = loc_cm[:, :, lvl]  # (B, M, P, 2, Lq)
        fx = loc[:, :, :, 0]
        fy = loc[:, :, :, 1]
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wxb = fx - x0
        wyb = fy - y0
        inside = (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
        wlb = w_cm[:, :, lvl] * inside  # (B, M, P, Lq)
        ix = (jnp.clip(x0, -1, W - 1) + 1).astype(jnp.int32)
        iy = (jnp.clip(y0, -1, H - 1) + 1).astype(jnp.int32)
        lin = iy * (W + 1) + ix  # (B, M, P, Lq)
        lin = jnp.transpose(lin, (0, 1, 3, 2)).reshape(B * M, Lq * P)
        w16 = jnp.stack(
            [(1 - wyb) * (1 - wxb), (1 - wyb) * wxb, wyb * (1 - wxb), wyb * wxb],
            axis=3,
        ) * wlb[:, :, :, None]  # (B, M, P, 4, Lq)
        w16 = jnp.transpose(w16.reshape(B, M, P * 4, Lq), (0, 1, 3, 2))
        outs.append((lin, w16))
    return outs


def gather_reduce_pure(tables, lins, w16s):
    """Gathers + MXU corner reduction ONLY — indices/weights prebuilt.
    The structural floor of the op."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    E_np, S_np = _reduction_mats(P, D)
    out = jnp.zeros((B, M, Lq, D), jnp.float32)
    for lvl in range(L):
        lin, w16 = lins[lvl], w16s[lvl]
        v = tables[lvl]
        g_dtype = v.dtype
        E_m = jnp.asarray(E_np, g_dtype)
        S_m = jnp.asarray(S_np, g_dtype)
        acc_heads = []
        for i in range(B * M):
            b, m = divmod(i, M)
            g = jax.lax.gather(
                v[i], lin[i][:, None], dnums, slice_sizes=(1, 4 * D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            wrow = jnp.dot(w16[b, m].astype(g_dtype), E_m, preferred_element_type=g_dtype)
            acc_heads.append(
                jnp.dot(g.reshape(Lq, P * 4 * D) * wrow, S_m, preferred_element_type=jnp.float32)
            )
        out = out + jnp.stack(acc_heads).reshape(B, M, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)


def gather_only(tables, lins):
    """Per-head gathers alone (consumer: strided lane-group sum is NOT safe
    — XLA slices through concats; a gather output consumed by a plain sum
    must still materialize, which is what we want here)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    acc = jnp.zeros((Lq * P, 4 * D), tables[0].dtype)
    for lvl in range(L):
        lin = lins[lvl]
        v = tables[lvl]
        for i in range(B * M):
            g = jax.lax.gather(
                v[i], lin[i][:, None], dnums, slice_sizes=(1, 4 * D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            acc = acc + g
    return acc


def gather_reduce_headpairs(tables, lins, w16s):
    """Variant: one gather per HEAD-PAIR per level (tables for heads 2i and
    2i+1 stacked along rows, indices offset by head base) — 12 gather ops
    instead of 24 per layer-equivalent, same slice count, 17 MB max table
    (measured to gather as fast as 8.5 MB). Measures per-gather-op overhead."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    E_np, S_np = _reduction_mats(P, D)
    out = jnp.zeros((B, M, Lq, D), jnp.float32)
    for lvl in range(L):
        lin, w16 = lins[lvl], w16s[lvl]
        v = tables[lvl]
        rows = v.shape[1]
        g_dtype = v.dtype
        E_m = jnp.asarray(E_np, g_dtype)
        S_m = jnp.asarray(S_np, g_dtype)
        acc_heads = []
        for i in range(B * M // 2):
            vp = v[2 * i : 2 * i + 2].reshape(2 * rows, 4 * D)
            lin2 = jnp.concatenate([lin[2 * i], lin[2 * i + 1] + rows])
            g = jax.lax.gather(
                vp, lin2[:, None], dnums, slice_sizes=(1, 4 * D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            ).reshape(2, Lq, P * 4 * D)
            for j in range(2):
                b, m = divmod(2 * i + j, M)
                wrow = jnp.dot(
                    w16[b, m].astype(g_dtype), E_m, preferred_element_type=g_dtype
                )
                acc_heads.append(
                    jnp.dot(g[j] * wrow, S_m, preferred_element_type=jnp.float32)
                )
        out = out + jnp.stack(acc_heads).reshape(B, M, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)


def gather_reduce_pure_batched(tables, lins, w16s):
    """Variant reduction: q-batched contraction einsum('qk,qkd->qd') — no
    (Lq, P*4*D) wrow intermediate (the two-dot E/S form materializes a
    ~42 MB dot output per head-level that cannot fuse into the next dot)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    out = jnp.zeros((B, M, Lq, D), jnp.float32)
    for lvl in range(L):
        lin, w16 = lins[lvl], w16s[lvl]
        v = tables[lvl]
        acc_heads = []
        for i in range(B * M):
            b, m = divmod(i, M)
            g = jax.lax.gather(
                v[i], lin[i][:, None], dnums, slice_sizes=(1, 4 * D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            G = g.reshape(Lq, P * 4, D)
            acc_heads.append(
                jnp.einsum(
                    "qk,qkd->qd", w16[b, m].astype(v.dtype), G,
                    preferred_element_type=jnp.float32,
                )
            )
        out = out + jnp.stack(acc_heads).reshape(B, M, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)


def gather_reduce_pure_dg(tables, lins, w16cms):
    """Variant: w16 stays COMPONENT-major (B, M, P*4, Lq); the E-dot
    contracts its dim 0 via dot_general, so the (P*4, Lq) -> (Lq, P*4)
    relayout disappears (the MXU can stream the transposed operand)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    E_np, S_np = _reduction_mats(P, D)
    out = jnp.zeros((B, M, Lq, D), jnp.float32)
    for lvl in range(L):
        lin, w16cm = lins[lvl], w16cms[lvl]
        v = tables[lvl]
        g_dtype = v.dtype
        E_m = jnp.asarray(E_np, g_dtype)
        S_m = jnp.asarray(S_np, g_dtype)
        acc_heads = []
        for i in range(B * M):
            b, m = divmod(i, M)
            g = jax.lax.gather(
                v[i], lin[i][:, None], dnums, slice_sizes=(1, 4 * D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            # (P4, Lq)^T @ (P4, P4D) -> (Lq, P4D), no explicit transpose
            wrow = jax.lax.dot_general(
                w16cm[b, m].astype(g_dtype), E_m,
                (((0,), (0,)), ((), ())), preferred_element_type=g_dtype,
            )
            acc_heads.append(
                jnp.dot(g.reshape(Lq, P * 4 * D) * wrow, S_m, preferred_element_type=jnp.float32)
            )
        out = out + jnp.stack(acc_heads).reshape(B, M, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)


def gather_reduce_pure_bcast(tables, lins, w16s):
    """Variant: broadcast-multiply-sum — (Lq, 16, D) * w16[:, :, None]
    summed over the middle axis, one fusion, no wrow dot output. Whether
    XLA picks a sane layout for the middle-axis reduce decides it (the r2
    einsum form relayouted; this reshape form may not)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    out = jnp.zeros((B, M, Lq, D), jnp.float32)
    for lvl in range(L):
        lin, w16 = lins[lvl], w16s[lvl]
        v = tables[lvl]
        acc_heads = []
        for i in range(B * M):
            b, m = divmod(i, M)
            g = jax.lax.gather(
                v[i], lin[i][:, None], dnums, slice_sizes=(1, 4 * D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            G = g.reshape(Lq, P * 4, D).astype(jnp.float32)
            acc_heads.append(jnp.sum(G * w16[b, m][:, :, None], axis=1))
        out = out + jnp.stack(acc_heads).reshape(B, M, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)


def gather_reduce_pure_rows_xla(tables, lins, w4s):
    """Variant: row-major algebra in plain XLA — no (LqP, 4D) -> (Lq, P4D)
    relayout of the gather output; corner weights lane-expand with a small
    E4-dot, the S4-dot sums corners, and the P point-rows fold with
    sublane-strided adds. w4s: per-level (B, M, Lq*P, 4)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    E_np, S_np = _reduction_mats(1, D)  # (4, 4D), (4D, D)
    out = jnp.zeros((B, M, Lq, D), jnp.float32)
    for lvl in range(L):
        lin, w4 = lins[lvl], w4s[lvl]
        v = tables[lvl]
        g_dtype = v.dtype
        E_m = jnp.asarray(E_np, g_dtype)
        S_m = jnp.asarray(S_np, g_dtype)
        acc_heads = []
        for i in range(B * M):
            b, m = divmod(i, M)
            g = jax.lax.gather(
                v[i], lin[i][:, None], dnums, slice_sizes=(1, 4 * D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )  # (LqP, 4D) — consumed as-is
            wrow = jnp.dot(w4[b, m].astype(g_dtype), E_m, preferred_element_type=g_dtype)
            part = jnp.dot(g * wrow, S_m, preferred_element_type=jnp.float32)
            acc_heads.append(part[0::P] + part[1::P] + part[2::P] + part[3::P])
        out = out + jnp.stack(acc_heads).reshape(B, M, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)


def gather_reduce(tables, loc_m, w_m):
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    E_np, S_np = _reduction_mats(P, D)
    out = jnp.zeros((B, M, Lq, D), jnp.float32)
    for lvl, (lin, w16) in enumerate(loc_w16(loc_m, w_m)):
        v = tables[lvl]
        g_dtype = v.dtype
        E_m = jnp.asarray(E_np, g_dtype)
        S_m = jnp.asarray(S_np, g_dtype)
        acc_heads = []
        for i in range(B * M):
            b, m = divmod(i, M)
            g = jax.lax.gather(
                v[i], lin[i][:, None], dnums, slice_sizes=(1, 4 * D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            wrow = jnp.dot(w16[b, m].astype(g_dtype), E_m, preferred_element_type=g_dtype)
            acc_heads.append(
                jnp.dot(g.reshape(Lq, P * 4 * D) * wrow, S_m, preferred_element_type=jnp.float32)
            )
        out = out + jnp.stack(acc_heads).reshape(B, M, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)


def main():
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, Lq, M, L, P, 2), jnp.float32)
    wts = jax.nn.softmax(jnp.asarray(rng.randn(B, Lq, M, L * P), jnp.float32)).reshape(
        B, Lq, M, L, P
    )
    loc_m = jnp.transpose(loc, (0, 2, 3, 4, 5, 1))  # (B, M, L, P, 2, Lq)
    w_m = jnp.transpose(wts, (0, 2, 3, 4, 1))  # (B, M, L, P, Lq)
    # production cm_abs inputs: absolute coords, component-major
    wh = jnp.asarray(
        [[[w], [h]] for (h, w) in SHAPES], jnp.float32
    ).reshape(1, 1, L, 1, 2, 1)
    loc_abs_cm = loc_m * wh - 0.5

    timed(
        "full op (cm_abs, production)",
        lambda v, l, w: ms_deform_attn(v, SHAPES, l, w, layout="cm_abs"),
        value, loc_abs_cm, w_m,
    )
    timed("tables only (3 levels)", build_tables, value)
    tables = jax.jit(build_tables)(value)
    timed("gather+reduce+loc (prebuilt tables)", gather_reduce, tables, loc_abs_cm, w_m)
    timed("loc+w16 only (production cm)", loc_w16, loc_abs_cm, w_m)
    pre = jax.jit(loc_w16)(loc_abs_cm, w_m)
    lins = [p[0] for p in pre]
    w16s = [p[1] for p in pre]
    timed("gather+reduce PURE (prebuilt idx/w)", gather_reduce_pure, tables, lins, w16s)
    # component-major w16 (pre-transpose): rebuild from the q-major form
    w16cms = [jnp.transpose(w, (0, 1, 3, 2)) for w in w16s]
    timed("gather+reduce PURE (dg cm-w16)", gather_reduce_pure_dg, tables, lins, w16cms)
    timed("gather+reduce PURE (bcast-sum)", gather_reduce_pure_bcast, tables, lins, w16s)
    # row-major weights: (B, M, Lq, P*4) -> (B, M, Lq*P, 4) (k = p*4 + c)
    w4s = [w.reshape(B, M, Lq * P, 4) for w in w16s]
    timed("gather+reduce PURE (rows XLA)", gather_reduce_pure_rows_xla, tables, lins, w4s)

    timed("gather+reduce PURE (batched einsum)", gather_reduce_pure_batched, tables, lins, w16s)
    timed("gather+reduce PURE (head pairs)", gather_reduce_headpairs, tables, lins, w16s)
    timed("gathers ONLY (prebuilt idx)", gather_only, tables, lins)


if __name__ == "__main__":
    main()
