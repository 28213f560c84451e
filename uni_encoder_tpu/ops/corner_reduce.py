"""Fused corner-weighted reduction for deformable attention (TPU Pallas).

The MSDA sampling core reduces the packed corner-gather output
``g (Lq, P*4*D)`` with per-(point, corner) weights ``w16 (Lq, P*4)``:

    out[q, d] = sum_k w16[q, k] * g[q, k*D + d]

The XLA formulation (ops/ms_deform_attn.py::reduce_rows, the two structured
0/1 matmuls over lanes) is MXU-native but its intermediate
``wrow = w16 @ E`` is a dot OUTPUT feeding another dot — on TPU, dot
outputs materialize to HBM, so every (head, level) pays ~3x the gather
output's bytes in pure wrow/g re-read traffic (~44 MB each at production
shapes). This kernel runs both dots tile-resident in VMEM, so HBM traffic
drops to: read g once, read w16 once, write (Lq, D) once.

Numerics are EXACTLY the XLA path's: E has a single 1 per column (so
``wrow`` holds exact bf16 copies of w16) and the S-dot accumulates the 16
products in fp32 on the MXU, same as ``preferred_element_type=f32``.

Training still works: a custom VJP re-derives the backward with plain XLA
ops (the same algebra autodiff produced for the two-dot form), so
``jax.grad`` through the op never differentiates the Pallas call.

Reference behavioral contract: ms_deform_attn_core_pytorch
(/root/reference/model/modeling/pixel_decoder/ops/functions/
ms_deform_attn_func.py:55-75) — this reduction is its
``(attention_weights * sampling_values).sum`` step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=8)
def _mats(K: int, D: int):
    """E (K, K*D): E[k, k*D+i] = 1 (lane-expand); S (K*D, D): sum D-groups."""
    E = np.zeros((K, K * D), np.float32)
    S = np.zeros((K * D, D), np.float32)
    for k in range(K):
        E[k, k * D : (k + 1) * D] = 1.0
        S[k * D : (k + 1) * D] += np.eye(D, dtype=np.float32)
    return E, S


def _kernel(g_ref, w_ref, e_ref, s_ref, o_ref):
    g = g_ref[:]  # (TQ, K*D) value dtype
    w = w_ref[:].astype(g.dtype)  # (TQ, K)
    wrow = jax.lax.dot_general(
        w, e_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(g.dtype)  # exact: E selects, no accumulation
    o_ref[:] = jax.lax.dot_general(
        g * wrow, s_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tile(lq: int) -> int:
    """Largest row tile <= 1024 that is a multiple of 8 and divides lq."""
    for tq in range(min(1024, lq), 7, -8):
        if lq % tq == 0:
            return tq
    return 0


@functools.partial(jax.jit, static_argnames=("D", "interpret"))
def _pallas_reduce(g, w16, D: int, interpret: bool = False):
    Lq, KD = g.shape
    K = KD // D
    TQ = _tile(Lq)
    assert TQ, (Lq,)
    E, S = _mats(K, D)
    return pl.pallas_call(
        _kernel,
        grid=(Lq // TQ,),
        out_shape=jax.ShapeDtypeStruct((Lq, D), jnp.float32),
        in_specs=[
            pl.BlockSpec((TQ, KD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, KD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KD, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TQ, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g, w16, jnp.asarray(E, g.dtype), jnp.asarray(S, g.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def corner_weighted_reduce(g, w16, D: int, interpret: bool = False):
    """out[q, d] = sum_k w16[q, k] * g[q, k*D + d], fp32 accumulation.

    g: (Lq, K*D) value dtype; w16: (Lq, K) f32. Returns (Lq, D) f32.
    """
    return _pallas_reduce(g, w16, D, interpret)


def _fwd(g, w16, D, interpret):
    return _pallas_reduce(g, w16, D, interpret), (g, w16)


def _bwd(D, interpret, res, dout):
    g, w16 = res
    Lq, KD = g.shape
    K = KD // D
    E, S = _mats(K, D)
    E_m = jnp.asarray(E, g.dtype)
    S_m = jnp.asarray(S, g.dtype)
    # dout (Lq, D) f32. dexp = dout @ S^T broadcasts dout across D-groups.
    dexp = jnp.dot(dout.astype(g.dtype), S_m.T, preferred_element_type=jnp.float32)
    wrow = jnp.dot(w16.astype(g.dtype), E_m, preferred_element_type=g.dtype)
    dg = (dexp * wrow).astype(g.dtype)
    dw16 = jnp.dot(
        (dexp * g.astype(jnp.float32)).astype(g.dtype), E_m.T,
        preferred_element_type=jnp.float32,
    ).astype(w16.dtype)
    return dg, dw16


corner_weighted_reduce.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# Row-major variant: consumes the gather output AS PRODUCED — (Lq*P, 4*D)
# point-major rows — so the (Lq*P, 4D) -> (Lq, P*4D) reshape (a ~44 MB
# cross-lane relayout per (head, level) at production shapes, paid by both
# the XLA two-dot form and the v1 kernel above) disappears entirely.
#
#   out[q, d] = sum_{p, c} w4[q*P + p, c] * g[q*P + p, c*D + d]
#
# In-kernel: wrow = w4 @ E4 lane-expands the 4 corner weights (exact bf16
# copies), prod = g * wrow, then the P point-rows are folded by a row-major
# reshape that merges each q's P consecutive rows into lanes, and ONE wider
# MXU dot (prod2 @ S_P, where S_P stacks P copies of the corner-sum matrix)
# sums all P*C lane-groups in fp32. The earlier sublane-strided fold
# (part[i::P]) hit Mosaic's gather lowering rule on real hardware
# ("Shape mismatch in input, indices and output"); this form is pure
# reshape+dot and lowers cleanly, at identical MAC count.


def _kernel_rows(P_const, g_ref, w_ref, e_ref, s_ref, o_ref):
    g = g_ref[:]  # (TR, CD)
    w = w_ref[:].astype(g.dtype)  # (TR, C)
    wrow = jax.lax.dot_general(
        w, e_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(g.dtype)
    prod = g * wrow  # (TR, CD)
    TR, CD = prod.shape
    o_ref[:] = jax.lax.dot_general(
        prod.reshape(TR // P_const, P_const * CD), s_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (TR//P, D)


def _tile_rows(rows: int, P: int) -> int:
    """Largest row tile <= 2048 that is a multiple of 8*P and divides rows."""
    step = 8 * P
    for tr in range(min(2048, rows) // step * step, step - 1, -step):
        if rows % tr == 0:
            return tr
    return 0


@functools.partial(jax.jit, static_argnames=("P", "D", "interpret"))
def _pallas_reduce_rows(g, w4, P: int, D: int, interpret: bool = False):
    rows, CD = g.shape
    assert CD % D == 0 and rows % P == 0, (g.shape, P, D)
    C = CD // D  # corners (4)
    TR = _tile_rows(rows, P)
    assert TR, (rows, P)
    E, S = _mats(C, D)
    S_P = np.concatenate([S] * P, axis=0)  # (P*CD, D): corner-sum per point-row
    return pl.pallas_call(
        functools.partial(_kernel_rows, P),
        grid=(rows // TR,),
        out_shape=jax.ShapeDtypeStruct((rows // P, D), jnp.float32),
        in_specs=[
            pl.BlockSpec((TR, CD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, CD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P * CD, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR // P, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g, w4, jnp.asarray(E, g.dtype), jnp.asarray(S_P, g.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def corner_weighted_reduce_rows(g, w4, P: int, D: int, interpret: bool = False):
    """out[q, d] = sum_{p, c} w4[q*P+p, c] * g[q*P+p, c*D+d], fp32 acc.

    g: (Lq*P, C*D) value dtype (the raw packed-corner gather output);
    w4: (Lq*P, C) f32. Returns (Lq, D) f32.
    """
    return _pallas_reduce_rows(g, w4, P, D, interpret)


def _fwd_rows(g, w4, P, D, interpret):
    return _pallas_reduce_rows(g, w4, P, D, interpret), (g, w4)


def _bwd_rows(P, D, interpret, res, dout):
    g, w4 = res
    rows, CD = g.shape
    C = CD // D
    E, S = _mats(C, D)
    E_m = jnp.asarray(E, g.dtype)
    S_m = jnp.asarray(S, g.dtype)
    # dpart[r] = dout[r // P]; dexp broadcasts it across the D-groups
    dpart = jnp.repeat(dout, P, axis=0)
    dexp = jnp.dot(dpart.astype(g.dtype), S_m.T, preferred_element_type=jnp.float32)
    wrow = jnp.dot(w4.astype(g.dtype), E_m, preferred_element_type=g.dtype)
    dg = (dexp * wrow).astype(g.dtype)
    dw4 = jnp.dot(
        (dexp * g.astype(jnp.float32)).astype(g.dtype), E_m.T,
        preferred_element_type=jnp.float32,
    ).astype(w4.dtype)
    return dg, dw4


corner_weighted_reduce_rows.defvjp(_fwd_rows, _bwd_rows)
