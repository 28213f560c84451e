"""Fused Swin block megakernel (TPU Pallas): LN1 -> windowed MSA (+relative
position bias, +shift masks) -> proj -> residual -> LN2 -> MLP -> residual,
on pre-partitioned windows.

Why: at 1024x2048 the Swin stages are HBM-traffic-bound — XLA runs the
block as ~15 separate passes over the stage-1 25 MB activation map. An
earlier attention-only Pallas kernel won in isolation but lost end-to-end
(custom calls are fusion barriers for the surrounding LN/partition chain,
see BASELINE.md negative result (a)). This kernel swallows the WHOLE block,
so the only XLA ops left per block are the pad/roll/partition relayouts —
pure data movement that never fused with anything anyway.

Design (all ops rank-2, nothing reshaped in-kernel — Mosaic-safe):
  * input windows flattened to (nWp*N, C) rows (N = window*window); each
    grid step processes WB windows = (WB*N, C) rows.
  * attention runs DENSE over the (WB*N, WB*N) tile; a precomputed additive
    mask (-1e30 off the window diagonal, shift mask on it, rel-pos bias
    separate) restores per-window isolation. The extra WB x FLOPs are
    MXU-cheap at these sizes; what matters is that q/k/v/logits never
    leave VMEM.
  * per-head q/k/v projections arrive PRE-SLICED as (3, H, C, Dh) so heads
    are leading-dim indexed (no 32-lane value slicing); the output
    projection is accumulated per head from (Dh, C) row slabs.
  * shifted blocks: each window's (N, N) shift mask depends only on its
    (last-row?, last-col?) class, so a block of WB consecutive windows has
    one of a handful of mask SIGNATURES; the per-block signature id is a
    scalar-prefetch operand selecting the right (WB*N, WB*N) additive tile
    from a small bank — the block-sparse-mask pattern.

Spec: reference model/modeling/backbone/swin.py:140-232 (SwinBlock forward:
LN -> W-MSA/SW-MSA with relative position bias -> residual -> LN -> 2-layer
GELU MLP -> residual). Numerics: f32 LN statistics and softmax, value-dtype
matmul inputs with f32 MXU accumulation — the dtype contract of the XLA
path in models/backbones/swin.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


@functools.lru_cache(maxsize=64)
def _window_masks(window: int, shift: int) -> np.ndarray:
    """(4, N, N) additive shift masks by window class
    [0 interior, 1 last-col, 2 last-row, 3 corner] — the reference's own
    -100 additive values, read off _shift_attn_mask on a wrap-free 2x2
    window tiling (see ops/pallas_swin.py::four_shift_masks)."""
    N = window * window
    if shift == 0:
        return np.zeros((4, N, N), np.float32)
    from .pallas_swin import four_shift_masks

    return four_shift_masks(window, shift)


@functools.lru_cache(maxsize=64)
def _block_signatures(hp: int, wp: int, window: int, shift: int, wb: int,
                      batch: int = 1):
    """Per-block signature ids + mask bank.

    Returns (sig_ids (nblocks,) int32, bank (S, wb*N, wb*N) f32): bank[s] is
    the block-diagonal additive mask (window isolation + per-class shift
    masks) for signature s. Window order is row-major (window_partition),
    repeated per batch image; a wb-block may straddle images (window
    isolation makes that safe — the signature just concatenates classes).
    """
    nh, nw = hp // window, wp // window
    n_win = nh * nw
    N = window * window
    if shift > 0:
        wr = np.arange(n_win) // nw
        wc = np.arange(n_win) % nw
        cls = ((wr == nh - 1) * 2 + (wc == nw - 1)).astype(np.int32)
    else:
        cls = np.zeros((n_win,), np.int32)
    cls = np.tile(cls, batch)
    n_win *= batch
    nwp = -(-n_win // wb) * wb
    cls = np.pad(cls, (0, nwp - n_win))  # padded windows: interior masks
    sigs = cls.reshape(-1, wb)
    uniq, sig_ids = np.unique(sigs, axis=0, return_inverse=True)
    wmasks = _window_masks(window, shift)
    T = wb * N
    bank = np.full((len(uniq), T, T), NEG, np.float32)
    for s, sig in enumerate(uniq):
        for j, c in enumerate(sig):
            bank[s, j * N : (j + 1) * N, j * N : (j + 1) * N] = wmasks[c]
    return sig_ids.astype(np.int32), bank


def _kernel(sig_ref, x_ref, valid_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
            ln1_ref, ln2_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
            bias_ref, bank_ref, o_ref, *, heads: int, dh: int, eps: float):
    del sig_ref  # consumed by the bank index_map
    x = x_ref[:].astype(jnp.float32)  # (T, C)

    def ln(z, sb_ref):
        mu = jnp.mean(z, axis=1, keepdims=True)
        zc = z - mu
        var = jnp.mean(zc * zc, axis=1, keepdims=True)
        zn = zc * jax.lax.rsqrt(var + eps)
        return zn * sb_ref[0:1] + sb_ref[1:2]  # (1, C) broadcasts

    # padded positions (image pad inside edge windows + window-count pad)
    # must enter attention as exact zeros — the XLA path pads AFTER LN1
    h = (ln(x, ln1_ref) * valid_ref[:]).astype(x_ref.dtype)

    scale = dh ** -0.5
    attn = jnp.zeros_like(x)
    bank = bank_ref[0]  # (T, T) f32, signature-selected
    for m in range(heads):
        q = jax.lax.dot_general(
            h, wqkv_ref[0, m], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0, m]
        k = jax.lax.dot_general(
            h, wqkv_ref[1, m], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[1, m]
        v = jax.lax.dot_general(
            h, wqkv_ref[2, m], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[2, m]
        s = jax.lax.dot_general(
            (q * scale).astype(x_ref.dtype), k.astype(x_ref.dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (T, T)
        s = s + bias_ref[m] + bank
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(x_ref.dtype), v.astype(x_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (T, Dh)
        attn = attn + jax.lax.dot_general(
            o.astype(x_ref.dtype), wp_ref[m], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    x1 = x + attn + bp_ref[0:1]

    y = ln(x1, ln2_ref).astype(x_ref.dtype)
    hmid = jax.lax.dot_general(
        y, wm1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bm1_ref[0:1]
    # tanh-approximate gelu in-kernel: exact gelu lowers through erfc, which
    # Mosaic has no TPU lowering for (smoke-confirmed on v5e). The tanh form
    # differs from exact by <~3e-3 relative pre-rounding — below the bf16
    # activation noise floor of the surrounding matmuls.
    hmid = jax.nn.gelu(hmid, approximate=True).astype(x_ref.dtype)
    out = x1 + jax.lax.dot_general(
        hmid, wm2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bm2_ref[0:1]
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "heads", "hp", "wp", "shift", "wb", "batch", "eps", "interpret"
    ),
)
def swin_block_fused(
    xw,          # (nWp*N, C) pre-partitioned windows, rows padded to wb*N
    params,      # dict, see below
    rel_bias,    # (H, N, N) f32 — gathered relative position bias
    valid,       # (nWp*N, 1) f32 — 1 for real positions, 0 for padding
    *,
    window: int,
    heads: int,
    hp: int,
    wp: int,
    shift: int,
    wb: int = 8,
    batch: int = 1,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """params keys: wqkv (3, H, C, Dh), bqkv (3, H, 1, Dh),
    wproj (H, Dh, C), bproj (1, C), ln1 (2, C), ln2 (2, C),
    wm1 (C, hidden), bm1 (1, hidden), wm2 (hidden, C), bm2 (1, C).
    Returns (nWp*N, C) in xw.dtype.
    """
    N = window * window
    T = wb * N
    assert T % 8 == 0, (
        f"wb*N={T} must be sublane-aligned (multiple of 8) for the Mosaic "
        f"(T, C) block lowering; with odd N={N} that means wb % 8 == 0"
    )
    rows, C = xw.shape
    assert rows % T == 0, (rows, T)
    nblocks = rows // T
    dh = params["wqkv"].shape[-1]
    H = heads
    hidden = params["wm1"].shape[1]

    sig_ids, bank_np = _block_signatures(hp, wp, window, shift, wb, batch)
    assert len(sig_ids) == nblocks, (len(sig_ids), nblocks)

    # block-diagonal rel-pos-bias tile (identical for every block); rel_bias
    # is traced (gathered from the bias-table param), so tile with jnp
    rb = rel_bias.astype(jnp.float32)
    eye = jnp.eye(wb, dtype=jnp.float32)
    bias = jax.vmap(lambda m: jnp.kron(eye, m))(rb)  # (H, T, T)
    bank = jnp.asarray(bank_np)  # (S, T, T)
    sig = jnp.asarray(sig_ids)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((T, C), lambda b, sig: (b, 0)),
            pl.BlockSpec((T, 1), lambda b, sig: (b, 0)),
            pl.BlockSpec((3, H, C, dh), lambda b, sig: (0, 0, 0, 0)),
            pl.BlockSpec((3, H, 1, dh), lambda b, sig: (0, 0, 0, 0)),
            pl.BlockSpec((H, dh, C), lambda b, sig: (0, 0, 0)),
            pl.BlockSpec((1, C), lambda b, sig: (0, 0)),
            pl.BlockSpec((2, C), lambda b, sig: (0, 0)),
            pl.BlockSpec((2, C), lambda b, sig: (0, 0)),
            pl.BlockSpec((C, hidden), lambda b, sig: (0, 0)),
            pl.BlockSpec((1, hidden), lambda b, sig: (0, 0)),
            pl.BlockSpec((hidden, C), lambda b, sig: (0, 0)),
            pl.BlockSpec((1, C), lambda b, sig: (0, 0)),
            pl.BlockSpec((H, T, T), lambda b, sig: (0, 0, 0)),
            pl.BlockSpec((1, T, T), lambda b, sig: (sig[b], 0, 0)),
        ],
        out_specs=pl.BlockSpec((T, C), lambda b, sig: (b, 0)),
    )

    kern = functools.partial(_kernel, heads=heads, dh=dh, eps=eps)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, C), xw.dtype),
        interpret=interpret,
    )(
        sig,
        xw,
        valid,
        params["wqkv"], params["bqkv"], params["wproj"], params["bproj"],
        params["ln1"], params["ln2"],
        params["wm1"], params["bm1"], params["wm2"], params["bm2"],
        bias, bank,
    )
