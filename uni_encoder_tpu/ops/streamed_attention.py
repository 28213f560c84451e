"""Streamed (online-softmax) cross-attention for tiny-Q / huge-K shapes.

The query decoder's class transformer attends ~150 queries over the
131072-token stride-4 feature map (reference
oneformer_transformer_decoder.py:432-438 / transformer.py:237-297). A
materializing attention writes (H, Q, N) logits (~312 MB bf16) plus 2-3
softmax passes — ~2 ms/layer of pure HBM traffic. This kernel keeps the
logits tile-resident in VMEM (classic flash-attention recurrence) so the
traffic is just K/V once.

Why not the stock pallas flash kernel: at head_dim 32 its (block, head_dim)
tiles lane-pad 32 -> 128, quadrupling K/V reads — measured 2.7x SLOWER than
XLA at K=131072 (tools/bench_flash_attn.py). Here K/V arrive per-head as
(H, N, 32) and the padding cost is only VMEM space, not HBM bytes.

Exact softmax (f32 running max / denominator — matches torch's fp32
softmax accumulation under AMP more closely than the bf16 XLA path).
Inference-only (no VJP); the training path keeps the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, nt: int,
            scale: float, dh: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)  # (Qp, dh)
    k = k_ref[0].astype(jnp.float32)  # (T, dh)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Qp, T)

    m_prev = m_ref[:, :1]  # (Qp, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # (Qp, 1)
    p = jnp.exp(s - m_new)  # (Qp, T)

    l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:, :1] = m_new
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Qp, dh)
    acc_ref[:] = alpha * acc_ref[:] + pv

    @pl.when(t == nt - 1)
    def _emit():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def streamed_cross_attention(
    q: jnp.ndarray,  # (H, Qp, Dh) — Qp a multiple of 8
    k: jnp.ndarray,  # (H, N, Dh) — N a multiple of block_k
    v: jnp.ndarray,  # (H, N, Dh)
    block_k: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:  # (H, Qp, Dh) in q.dtype
    H, Qp, Dh = q.shape
    N = k.shape[1]
    assert N % block_k == 0, (N, block_k)
    nt = N // block_k
    scale = Dh ** -0.5

    kern = functools.partial(_kernel, nt=nt, scale=scale, dh=Dh)
    return pl.pallas_call(
        kern,
        grid=(H, nt),
        out_shape=jax.ShapeDtypeStruct((H, Qp, Dh), q.dtype),
        in_specs=[
            pl.BlockSpec((1, Qp, Dh), lambda h, t: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), lambda h, t: (h, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), lambda h, t: (h, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Qp, Dh), lambda h, t: (h, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Qp, 1), jnp.float32),  # running max
            pltpu.VMEM((Qp, 1), jnp.float32),  # running denominator
            pltpu.VMEM((Qp, Dh), jnp.float32),  # weighted accumulator
        ],
        interpret=interpret,
    )(q, k, v)
