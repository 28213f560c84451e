"""Decompose the query decoder's ~10 ms: class transformer (2 DETR layers
over the 131k-token stride-4 map) vs the 9 masked rounds vs the attn-mask
einsum chain. Ablation via module config (fresh-init params; timing only).

Scan harness; subtract ~3 ms/iter floor; compare stages within one run.
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

from uni_encoder_tpu.models.transformer_decoder import OneFormerQueryDecoder  # noqa: E402

B, C = 1, 256
SIZES = [(32, 64), (64, 128), (128, 256)]  # low->high res levels
MH, MW = 256, 512


def main():
    rng = np.random.RandomState(0)
    ms = [
        jnp.asarray(rng.randn(B, h, w, C), jnp.bfloat16) for (h, w) in SIZES
    ]
    mf = jnp.asarray(rng.randn(B, MH, MW, C), jnp.bfloat16)
    te = jnp.asarray(rng.randn(B, C), jnp.bfloat16)

    def run(qd):
        qv = jax.jit(qd.init)(jax.random.PRNGKey(0), ms, mf, te)
        qv = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, qv
        )

        def f(v, ms, mf, te):
            o = qd.apply(v, ms, mf, te)
            return o["pred_logits"], o["pred_masks"]

        return qv, f

    for name, kw in [
        ("full (2 cls + 9 rounds)", {}),
        ("no class transformer", {"class_dec_layers": 0}),
        ("3 rounds only", {"dec_layers": 3}),
        ("0 rounds (cls + final masks)", {"dec_layers": 0}),
    ]:
        qd = OneFormerQueryDecoder(**kw)
        try:
            qv, f = run(qd)
            timed(f"qdec {name}", f, qv, ms, mf, te)
        except Exception as e:  # noqa: BLE001
            print(f"qdec {name}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
