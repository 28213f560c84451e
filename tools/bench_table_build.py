"""Microbench: packed-corner-table build variants for ms_deform_attn.

The production op builds, per encoder layer and level, a (B*M, (H+1)*(W+1),
4D) table packing the 2x2 bilinear corner footprint into lanes (see
ops/ms_deform_attn.py). Measured r3 cost ~3.8 ms/layer (~23 ms/frame over 6
layers) — far above the ~0.3 ms bandwidth bound, i.e. relayout-bound.
This bench compares formulations ON THE REAL CHIP (run under axon):

  two_concat   — production: pad, x-pair concat, y-pair concat
  one_concat   — single 4-operand concat of shifted padded views
  dus          — dynamic_update_slice composition into a zeros buffer
  patches      — lax.conv_general_dilated_patches (im2col)

Timing protocol per BASELINE.md: dispatch-loop with input perturbation so
XLA cannot hoist, host-fetch fence (block_until_ready is a no-op through the
axon tunnel), null-loop subtraction.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uni_encoder_tpu.utils.cache import probe_axon_relay, setup_compile_cache

probe_axon_relay()

setup_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, M, D = 1, 8, 32
LEVELS = [(128, 256), (64, 128), (32, 64)]


def two_concat(v, H, W):
    v = v.reshape(B * M, H, W, D)
    v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    v = jnp.concatenate([v[:, :, :-1], v[:, :, 1:]], axis=-1)
    v = jnp.concatenate([v[:, :-1], v[:, 1:]], axis=-1)
    return v.reshape(B * M, (H + 1) * (W + 1), 4 * D)


def one_concat(v, H, W):
    v = v.reshape(B * M, H, W, D)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    t = jnp.concatenate(
        [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]],
        axis=-1,
    )
    return t.reshape(B * M, (H + 1) * (W + 1), 4 * D)


def flat_concat(v, H, W):
    """Stride-preserving layout: table keeps the padded row stride (W+2), so
    every corner is a STATIC sublane offset of the flattened (S, D) array —
    no per-row boundary handling. Gather indices become iy*(W+2)+ix (one
    unused row per y; never indexed)."""
    v = v.reshape(B * M, H, W, D)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    vpf = vp.reshape(B * M, (H + 2) * (W + 2), D)
    vpf = jnp.pad(vpf, ((0, 0), (0, 1), (0, 0)))
    N = (H + 1) * (W + 2)
    t = jnp.concatenate(
        [vpf[:, :N], vpf[:, 1 : N + 1], vpf[:, W + 2 : N + W + 2], vpf[:, W + 3 : N + W + 3]],
        axis=-1,
    )
    return t


@functools.lru_cache(maxsize=4)
def _emats(D):
    E = np.zeros((4, D, 4 * D), np.float32)
    for k in range(4):
        E[k, :, k * D : (k + 1) * D] = np.eye(D)
    return E


def mxu_expand(v, H, W):
    """Flat-stride table via 4 MXU lane-expansion matmuls: each corner is a
    contiguous shifted view of the flat padded map matmul'd with a constant
    0/1 (D, 4D) placement matrix; the adds accumulate the disjoint lane
    groups. Exact in bf16 (x*1+0 through the f32 MXU accumulator)."""
    v = v.reshape(B * M, H, W, D)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    vpf = vp.reshape(B * M, (H + 2) * (W + 2), D)
    vpf = jnp.pad(vpf, ((0, 0), (0, 1), (0, 0)))
    N = (H + 1) * (W + 2)
    E = _emats(D)
    t = None
    for k, off in enumerate((0, 1, W + 2, W + 3)):
        p = jax.lax.dot_general(
            vpf[:, off : off + N],
            jnp.asarray(E[k], v.dtype),
            (((2,), (0,)), ((), ())),
        )
        t = p if t is None else t + p
    return t


def flat_concat_f32(v, H, W):
    """flat_concat at f32: 128-byte interleave chunks instead of 64-byte
    (gather cost is dtype-independent per BASELINE.md; table doubles)."""
    return flat_concat(v.astype(jnp.float32), H, W)


def dus(v, H, W):
    v = v.reshape(B * M, H, W, D)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B * M, H + 1, W + 1, 4 * D), v.dtype)
    for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        out = jax.lax.dynamic_update_slice(
            out, vp[:, dy : dy + H + 1, dx : dx + W + 1], (0, 0, 0, k * D)
        )
    return out.reshape(B * M, (H + 1) * (W + 1), 4 * D)


def patches(v, H, W):
    v = v.reshape(B * M, H, W, D)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # NHWC 2x2 patch extraction; output channel order is (c, ky, kx) ->
    # need (ky, kx, c); take the cost of its native order as the bound
    p = jax.lax.conv_general_dilated_patches(
        vp, (2, 2), (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return p.reshape(B * M, (H + 1) * (W + 1), 4 * D)


def bench(fn, n=30):
    """The consumer is a small dynamic-index GATHER per level: gather
    operands must be materialized (XLA cannot fuse or dead-code the table
    away, which it demonstrably does for cheap slice consumers — a
    ::997,:1 slice read makes every concat variant measure ~0 net)."""
    key = jax.random.PRNGKey(0)
    vals = [
        jax.random.normal(key, (B * M, H * W, D), jnp.bfloat16)
        for (H, W) in LEVELS
    ]
    NG = 4096
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )

    @jax.jit
    def step(vals, eps):
        outs = []
        for v, (H, W) in zip(vals, LEVELS):
            t = fn(v + eps, H, W)
            nrows = t.shape[1]
            # dynamic (input-derived) indices: not constant-foldable
            idx = (
                jnp.cumsum(jnp.abs(v[0, :NG, 0]).astype(jnp.int32) + 1)
                % nrows
            )
            for i in range(B * M):
                g = jax.lax.gather(
                    t[i], idx[:, None], dnums, slice_sizes=(1, t.shape[2]),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )
                outs.append(jnp.sum(g.astype(jnp.float32)))
        return jnp.stack(outs).sum()

    # warmup/compile, then queue all n dispatches and fence ONCE (the
    # production bench.py protocol: per-dispatch tunnel noise ~±4 ms would
    # otherwise swamp millisecond-scale differences)
    float(step(vals, jnp.bfloat16(0.0)))
    t0 = time.perf_counter()
    r = None
    for i in range(n):
        r = step(vals, jnp.bfloat16((i + 1) * 1e-30))
    float(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    return dt


def bench_null(n=30):
    """Dispatch + gather floor: same gathers as bench() but from PREBUILT
    tables passed as inputs — subtracting isolates the build cost."""
    key = jax.random.PRNGKey(0)
    vals = [
        jax.random.normal(key, (B * M, H * W, D), jnp.bfloat16)
        for (H, W) in LEVELS
    ]
    tables = [flat_concat(v, H, W) for v, (H, W) in zip(vals, LEVELS)]
    tables = [jax.device_put(t) for t in tables]
    NG = 4096
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )

    @jax.jit
    def step(vals, tables, eps):
        outs = []
        for v, t in zip(vals, tables):
            nrows = t.shape[1]
            idx = (
                jnp.cumsum(jnp.abs(v[0, :NG, 0] + eps).astype(jnp.int32) + 1)
                % nrows
            )
            for i in range(B * M):
                g = jax.lax.gather(
                    t[i], idx[:, None], dnums, slice_sizes=(1, t.shape[2]),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )
                outs.append(jnp.sum(g.astype(jnp.float32)))
        return jnp.stack(outs).sum()

    float(step(vals, tables, jnp.bfloat16(0.0)))
    t0 = time.perf_counter()
    r = None
    for i in range(n):
        r = step(vals, tables, jnp.bfloat16((i + 1) * 1e-30))
    float(r)
    return (time.perf_counter() - t0) / n * 1e3


if __name__ == "__main__":
    null = bench_null()
    print(f"null dispatch floor: {null:.2f} ms")
    for name, fn in [
        ("two_concat", two_concat),
        ("one_concat", one_concat),
        ("flat_concat", flat_concat),
        ("mxu_expand", mxu_expand),
        ("flat_f32", flat_concat_f32),
        ("dus", dus),
        ("patches", patches),
    ]:
        try:
            dt = bench(fn)
            print(f"{name:12s}: {dt:.2f} ms total ({dt - null:.2f} net, all 3 levels x 1 layer)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s}: FAILED {type(e).__name__}: {e}")
