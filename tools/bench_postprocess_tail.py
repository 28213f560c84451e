"""Microbench: fused-postprocess output-path variants on the real chip.

The fused kernel emits phase-separated (4, 4, h, w) i32 maps; the tail
de-interleaves them to (H, W) with a transpose whose minor dim is 4 — a
pathological TPU relayout shape. Variants:

  full       — production since e8108d2: the kernel emits TWO u8 phase
               maps (sem winner, panoptic id; no separate winbin output),
               de-interleaved on device to (H, W) u8
  phase_out  — no device de-interleave at all (host decodes the wire)

Scan harness (tools/profile_stages.timed): ~2.9 ms/iter floor, subtract the
relative differences only.
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from profile_stages import timed  # noqa: E402

from uni_encoder_tpu.inference.fused_postprocess import (  # noqa: E402
    fused_multitask_inference,
)

Q, K = 150, 19
h, w = 256, 512


def main():
    rng = np.random.RandomState(0)
    mask_cls = jnp.asarray(rng.randn(Q, K + 1) * 3, jnp.float32)
    mask_pred = jnp.asarray(rng.randn(Q, h, w) * 4 - 3, jnp.bfloat16)
    thing_mask = jnp.asarray(np.isin(np.arange(K), np.arange(11, K)))

    def full(mc, mp):
        o = fused_multitask_inference(mc, mp, thing_mask)
        return (
            o["sem_seg_argmax"].astype(jnp.uint8),
            o["panoptic_seg"].astype(jnp.uint8),
            o["scores"],
        )

    timed("full (2x u8 deinterleave, production)", full, mask_cls, mask_pred)

    def phase_out(mc, mp):
        o = fused_multitask_inference(mc, mp, thing_mask, phase_layout=True)
        return (
            o["sem_seg_argmax"],
            o["panoptic_seg"],
            o["scores"],
        )

    try:
        timed("phase-layout out (no deinterleave)", phase_out, mask_cls, mask_pred)
    except TypeError as e:
        print("phase_layout not implemented yet:", e)


if __name__ == "__main__":
    main()
