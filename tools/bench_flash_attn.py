"""Microbench: streamed (flash) vs materializing attention at query-decoder
shapes — Q tiny (150 padded), K huge (the stride-4 mask-feature map), 8 heads
of 32. The materializing path writes (H, Q, K) logits (~312 MB at K=131072)
plus 2-3 softmax passes; a streamed kernel's traffic is just K/V.

Run under axon (real chip). Queue-and-fence protocol.
"""
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

B, H, Dh = 1, 8, 32
QP = 256  # padded query rows


def xla_attn(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=q.dtype)
    attn = jax.nn.softmax(logits * (Dh ** -0.5), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def flash_attn(q, k, v):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa.flash_attention(q, k, v, sm_scale=Dh ** -0.5)


def bench(fn, K, n=30):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, QP, Dh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16)

    @jax.jit
    def step(q, k, v, eps):
        return jnp.sum(fn(q + eps, k, v).astype(jnp.float32))

    float(step(q, k, v, jnp.bfloat16(0.0)))
    t0 = time.perf_counter()
    r = None
    for i in range(n):
        r = step(q, k, v, jnp.bfloat16((i + 1) * 1e-30))
    float(r)
    return (time.perf_counter() - t0) / n * 1e3


if __name__ == "__main__":
    for K in (32768, 131072):
        for name, fn in (("xla", xla_attn), ("flash", flash_attn)):
            try:
                dt = bench(fn, K)
                print(f"K={K:6d} {name:6s}: {dt:.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"K={K:6d} {name:6s}: FAILED {type(e).__name__}: {str(e)[:160]}")
