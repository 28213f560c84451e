"""Microbench: Swin window-attention einsum batching variants (real chip).

Theory: backbone cost is dominated by MXU batch-dispatch overhead of
thousands of tiny (49x49x32) batched matmuls (stage 1: 2738 windows x 3
heads). Grouping G consecutive windows into one (G*49, G*49) masked
attention cuts the batch count G-fold at G x the logits traffic.

Measures, per stage shape, the attention core only (qk einsum + bias add +
softmax + av einsum) for G in {1, 2, 4, 8}.
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

# (name, nW, heads, blocks_at_stage) for swin-T at 1024x2048 input
STAGES = [
    ("stage1 256x512 c96", 37 * 74, 3, 2),
    ("stage2 128x256 c192", 19 * 37, 6, 2),
    ("stage3 64x128 c384", 10 * 19, 12, 6),
    ("stage4 32x64 c768", 5 * 10, 24, 2),
]
N = 49
DH = 32


def attn_core(q, k, v, bias):
    # q/k/v: (B_, H, N', Dh); bias additive (1 or B_, H, N', N')
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=q.dtype)
    attn = attn + bias
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def main():
    rng = np.random.RandomState(0)
    for name, nW, H, blocks in STAGES:
        for G in (1, 2, 4, 8):
            if nW % G:
                nWg = nW // G + 1
            else:
                nWg = nW // G
            Np = N * G
            B_ = nWg
            q = jnp.asarray(rng.randn(B_, H, Np, DH), jnp.bfloat16)
            k = jnp.asarray(rng.randn(B_, H, Np, DH), jnp.bfloat16)
            v = jnp.asarray(rng.randn(B_, H, Np, DH), jnp.bfloat16)
            if G == 1:
                bias = jnp.asarray(rng.randn(1, H, Np, Np) * 0.02, jnp.bfloat16)
            else:
                # block-diagonal -100 mask + bias, shared across groups
                m = np.full((Np, Np), -100.0, np.float32)
                for g in range(G):
                    m[g * N : (g + 1) * N, g * N : (g + 1) * N] = 0.0
                bias = jnp.asarray(
                    rng.randn(1, H, Np, Np) * 0.02 + m[None, None], jnp.bfloat16
                )
            dt = timed(
                f"{name} G={G} B_={B_ * H}",
                lambda q, k, v: attn_core(q, k, v, bias) * 1.0,
                q, k, v,
            )
            del q, k, v, bias
        print()


if __name__ == "__main__":
    main()
