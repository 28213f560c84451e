"""Decompose the Swin-T backbone's ~22 ms at 1024x2048: per-stage cost and,
within stage 1 (the 131k-token stage that dominates), per-component cost —
LN, qkv projection + head split, attention einsums + softmax, window
partition/reverse relayouts, MLP.

Scan harness from profile_stages (subtract the ~3 ms/iter floor when
comparing; compare stages within one run). Run on the real TPU chip.
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_stages import timed  # noqa: E402

from uni_encoder_tpu.models.backbones.swin import (  # noqa: E402
    SwinBlock,
    SwinTransformer,
    window_partition,
    window_reverse,
)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 1024, 2048, 3), jnp.bfloat16)

    bb = SwinTransformer()
    v = jax.jit(bb.init)(jax.random.PRNGKey(0), img.astype(jnp.float32))
    v = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, v
    )
    timed("backbone full", lambda v, x: bb.apply(v, x), v, img)

    # per-stage: isolate each resolution's pair-of-blocks cost with a fresh
    # tiny module at that stage's shapes (stage i: H/4/2^i, C*2^i, depths
    # (2,2,6,2), heads (3,6,12,24))
    for i, (h, w, c, nh, depth) in enumerate(
        [(256, 512, 96, 3, 2), (128, 256, 192, 6, 2), (64, 128, 384, 12, 6), (32, 64, 768, 24, 2)]
    ):
        x = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)

        import flax.linen as nn

        class Stage(nn.Module):
            @nn.compact
            def __call__(self, x):
                for j in range(depth):
                    x = SwinBlock(
                        dim=c, num_heads=nh, window=7,
                        shift=0 if j % 2 == 0 else 3, name=f"b{j}",
                    )(x)
                return x

        st = Stage()
        sv = jax.jit(st.init)(jax.random.PRNGKey(0), x)
        sv = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t, sv
        )
        timed(f"stage{i+1} {h}x{w} c{c} x{depth}blk", lambda v, x: st.apply(v, x), sv, x)

    # stage-1 component ablation at (259, 518) padded shapes
    H, W, C, NH = 256, 512, 96, 3
    x = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    blk = SwinBlock(dim=C, num_heads=NH, window=7, shift=0)
    bv = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
    bv = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t, bv
    )
    timed("stage1 one block (full)", lambda v, x: blk.apply(v, x), bv, x)

    xp = jnp.pad(x, ((0, 0), (0, 3), (0, 6), (0, 0)))
    timed(
        "stage1 partition+reverse only",
        lambda t: window_reverse(window_partition(t, 7), 7, 259, 518),
        xp,
    )

    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5)
    lv = jax.jit(ln.init)(jax.random.PRNGKey(0), x)
    timed("stage1 one LayerNorm", lambda v, t: ln.apply(v, t), lv, x)

    xw = jnp.asarray(rng.randn(37 * 74, 49, C), jnp.bfloat16)  # stage-1 windows
    qkvk = jnp.asarray(rng.randn(C, 3 * C), jnp.bfloat16)
    outk = jnp.asarray(rng.randn(C, C), jnp.bfloat16)
    rb = jnp.asarray(rng.randn(NH, 49, 49), jnp.bfloat16)

    def attn_only(xw, qkvk, outk, rb):
        B_, N, C_ = xw.shape
        Dh = C_ // NH
        qkv = xw @ qkvk
        qkv = qkv.reshape(B_, N, 3, NH, Dh).transpose(2, 0, 3, 1, 4)
        q, k, vv = qkv[0] * (Dh ** -0.5), qkv[1], qkv[2]
        a = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=q.dtype)
        a = jax.nn.softmax(a + rb[None], axis=-1).astype(vv.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, vv).transpose(0, 2, 1, 3).reshape(B_, N, C_)
        return o @ outk

    timed("stage1 window attention only", attn_only, xw, qkvk, outk, rb)

    def qkv_split_only(xw, qkvk):
        B_, N, C_ = xw.shape
        Dh = C_ // NH
        qkv = (xw @ qkvk).reshape(B_, N, 3, NH, Dh).transpose(2, 0, 3, 1, 4)
        return qkv[0] + qkv[1] + qkv[2]

    timed("stage1 qkv matmul+split only", qkv_split_only, xw, qkvk)

    def attn_slices(xw, qkvk, outk, rb):
        """Variant: q/k/v from contiguous lane slices of the qkv matmul
        output; heads stay a trailing-reshape batch dim (no 5D transpose)."""
        B_, N, C_ = xw.shape
        Dh = C_ // NH
        qkv = xw @ qkvk  # (B_, N, 3C)
        q = qkv[:, :, :C_].reshape(B_, N, NH, Dh) * (Dh ** -0.5)
        k = qkv[:, :, C_ : 2 * C_].reshape(B_, N, NH, Dh)
        vv = qkv[:, :, 2 * C_ :].reshape(B_, N, NH, Dh)
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=q.dtype)
        a = jax.nn.softmax(a + rb[None], axis=-1).astype(vv.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, vv).reshape(B_, N, C_)
        return o @ outk

    timed("stage1 window attention (lane-slice qkv)", attn_slices, xw, qkvk, outk, rb)

    def mlp_only(t, w1, w2):
        return jax.nn.gelu(t @ w1, approximate=False) @ w2

    w1 = jnp.asarray(rng.randn(C, 4 * C), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(4 * C, C), jnp.bfloat16)
    timed("stage1 mlp only", mlp_only, x.reshape(1, -1, C), w1, w2)


if __name__ == "__main__":
    main()
