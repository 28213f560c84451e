"""Gather-formulation sweep at production MSDA shapes (one TPU chip).

The deformable decoder's floor is the per-(head, level) packed-corner
gathers: 24 gathers x 172032 slices x 128 lanes per layer, measured
~2.6 ns/slice in the production op while isolated microbenches have shown
as low as ~1.9 ns/slice. This tool sweeps the axes that could explain the
gap, each with the trusted in-scan harness (data-dependent carry, all-float
perturbation) MINUS a null measurement (the scan harness has a ~2.9 ms/iter
scalar-pipeline floor; see BASELINE.md).

Variants (all produce identical gather work unless noted):
  prod          per-(b,head) rank-2 gathers, (LqP, 1) index column (current)
  f32tab        same, f32 tables (same slice count, 2x bytes)
  two_halves    each head's gather split into 2 gathers of LqP/2 rows
  batched       ONE gather per level with a batching dim over B*M heads
  clip          mode=CLIP instead of PROMISE_IN_BOUNDS
  sorted        indices ascending (locality control — measured no effect r3)
  w256          tables packed 2 heads wide (256-lane slices, half the
                gathers; needs per-head lane slicing after — width test)

Usage: python tools/bench_gather_sweep.py [variant ...]   (default: all)
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

ITERS = 8
B, M, D, P = 1, 8, 32, 4
SHAPES = ((128, 256), (64, 128), (32, 64))
L = len(SHAPES)
Lq = sum(h * w for h, w in SHAPES)
SLICES = B * M * Lq * P * L  # 4.13M


# the subtle scan harness (data-dependent carry, per-leaf perturbation to
# defeat XLA loop-invariant hoisting) lives in ONE place: profile_stages
import profile_stages  # noqa: E402
from profile_stages import timed as _scan_timed  # noqa: E402

assert ITERS == profile_stages.ITERS, "ns/slice math assumes the harness scan length"


def timed(name, fn, *args, null_ms=0.0):
    dt = _scan_timed(name, fn, *args) - null_ms
    ns = dt * 1e6 / SLICES
    print(f"  net of harness floor: {dt:8.2f} ms  {ns:6.2f} ns/slice", flush=True)
    return dt


DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)
PIB = jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS


def make_inputs(rng, dtype=jnp.bfloat16, idx_dtype=jnp.int32, sort=False):
    tables, lins = [], []
    for H, W in SHAPES:
        rows = (H + 1) * (W + 1)
        tables.append(jnp.asarray(rng.randn(B * M, rows, 4 * D), dtype))
        idx = rng.randint(0, rows, size=(B * M, Lq * P))
        if sort:
            idx = np.sort(idx, axis=1)
        lins.append(jnp.asarray(idx, idx_dtype))
    return tables, lins


def gathers_unrolled(tables, lins, mode=PIB):
    acc = jnp.zeros((Lq * P, 4 * D), tables[0].dtype)
    for lvl in range(L):
        v, lin = tables[lvl], lins[lvl]
        for i in range(B * M):
            g = jax.lax.gather(v[i], lin[i][:, None], DNUMS, slice_sizes=(1, 4 * D), mode=mode)
            acc = acc + g
    return acc


def gathers_two_halves(tables, lins):
    h = Lq * P // 2
    acc = jnp.zeros((h, 4 * D), tables[0].dtype)
    for lvl in range(L):
        v, lin = tables[lvl], lins[lvl]
        for i in range(B * M):
            for s in range(2):
                g = jax.lax.gather(
                    v[i], lin[i, s * h : (s + 1) * h][:, None], DNUMS,
                    slice_sizes=(1, 4 * D), mode=PIB,
                )
                acc = acc + g
    return acc


def gathers_batched(tables, lins):
    """One gather per level with a leading batch dim (the pre-r2 form)."""
    bd = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,),
    )
    acc = jnp.zeros((B * M, Lq * P, 4 * D), tables[0].dtype)
    for lvl in range(L):
        g = jax.lax.gather(
            tables[lvl], lins[lvl][..., None], bd, slice_sizes=(1, 1, 4 * D), mode=PIB
        )
        acc = acc + g
    return acc


def gathers_w256(tables2, lins2):
    """2-heads-wide tables: 256-lane slices, half the gather count. Uses the
    SAME indices for the head pair (width cost test only — production would
    need per-head indices, which this formulation cannot express)."""
    acc = jnp.zeros((Lq * P, 8 * D), tables2[0].dtype)
    for lvl in range(L):
        v, lin = tables2[lvl], lins2[lvl]
        for i in range(B * M // 2):
            g = jax.lax.gather(v[i], lin[i][:, None], DNUMS, slice_sizes=(1, 8 * D), mode=PIB)
            acc = acc + g
    return acc


def main():
    known = {"prod", "f32tab", "two_halves", "batched", "clip", "sorted", "w256"}
    which = set(sys.argv[1:]) or known
    unknown = which - known
    if unknown:
        sys.exit(f"unknown variant(s) {sorted(unknown)}; choose from {sorted(known)}")
    rng = np.random.RandomState(0)
    null = timed("null (harness floor)", lambda x: x * 1.0000001,
                 jnp.ones((8, 128), jnp.float32))
    print(f"  (subtracting {null:.2f} ms from all rows)", flush=True)

    tables, lins = make_inputs(rng)
    if "prod" in which:
        timed("prod per-head 128-lane", gathers_unrolled, tables, lins, null_ms=null)
    if "f32tab" in which:
        t32, l32 = make_inputs(rng, dtype=jnp.float32)
        timed("f32 tables", gathers_unrolled, t32, l32, null_ms=null)
    if "two_halves" in which:
        timed("two halves per head", gathers_two_halves, tables, lins, null_ms=null)
    if "batched" in which:
        timed("batched-dim single gather", gathers_batched, tables, lins, null_ms=null)
    if "clip" in which:
        timed("mode=CLIP", lambda t, l: gathers_unrolled(t, l, jax.lax.GatherScatterMode.CLIP),
              tables, lins, null_ms=null)
    if "sorted" in which:
        ts, ls = make_inputs(rng, sort=True)
        timed("sorted indices", gathers_unrolled, ts, ls, null_ms=null)
    if "w256" in which:
        t2, l2 = [], []
        for (H, W), t, l in zip(SHAPES, tables, lins):
            rows = (H + 1) * (W + 1)
            t2.append(t.reshape(B * M // 2, 2, rows, 4 * D).transpose(0, 2, 1, 3)
                      .reshape(B * M // 2, rows, 8 * D))
            l2.append(l[::2])
        timed("256-lane 2-head slices (x0.5 ops)", gathers_w256, t2, l2, null_ms=null)


if __name__ == "__main__":
    main()
