"""Hardware smoke for the fused Pallas postprocess kernel at production
shapes: lowering + numerics vs the unfused XLA pipeline, on the real chip.
Cheap (~1 min compile) — run this before any full-graph bench after
touching the kernel. (The fused Swin block smoke was removed with the
kernel itself: measured end-to-end loser, r5 decision table in
BASELINE.md.)
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


FAILURES = []


def section(name):
    """Isolate each kernel's smoke: one kernel failing to lower must not
    mask the others' results (r4: the rows-reduce lowering error hid the
    streamed-attention/Swin/postprocess results for the whole TPU window)."""
    def deco(fn):
        def run(*a, **k):
            try:
                fn(*a, **k)
                print(f"[SMOKE PASS] {name}", flush=True)
            except Exception as e:
                FAILURES.append(name)
                import traceback
                traceback.print_exc()
                print(f"[SMOKE FAIL] {name}: {type(e).__name__}: {e}", flush=True)
        return run
    return deco


@section("fused_postprocess")
def smoke_fused_postprocess(rng):
    # ---- fused multi-task postprocess: lowering at production shape, then
    # pixel-map/score parity vs the unfused pipeline at a small shape
    from uni_encoder_tpu.inference.fused_postprocess import fused_multitask_inference
    from uni_encoder_tpu.inference.postprocess import (
        instance_inference, panoptic_inference, semantic_inference,
    )
    from uni_encoder_tpu.ops import interpolate

    Q, K = 150, 133
    cls = jnp.asarray(rng.randn(Q, K + 1) * 3, jnp.float32)
    mp = jnp.asarray(rng.randn(Q, 256, 512), jnp.bfloat16)
    tm = jnp.asarray(np.arange(K) >= K // 2)
    t0 = time.perf_counter()
    full = fused_multitask_inference(cls, mp, tm, topk=Q, phase_layout=True)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), full)
    float(full["scores"][0])  # host fetch fence (tunnel-safe)
    print(f"fused_postprocess lowered+ran in {time.perf_counter()-t0:.1f}s", flush=True)

    Qs, Ks, hs, ws = 20, 7, 16, 32
    cls_s = jnp.asarray(rng.randn(Qs, Ks + 1) * 3, jnp.float32)
    blob = np.zeros((Qs, hs, ws), np.float32)
    yy, xx = np.mgrid[0:hs, 0:ws]
    for qi in range(Qs):
        d = np.sqrt((yy - rng.randint(0, hs)) ** 2 + (xx - rng.randint(0, ws)) ** 2)
        blob[qi] = (rng.uniform(2, 8) - d) * rng.uniform(0.5, 2.0)
    mp_s = jnp.asarray(blob, jnp.bfloat16)
    tm_s = jnp.asarray(np.arange(Ks) >= Ks // 2)
    fused = jax.tree_util.tree_map(
        np.asarray, fused_multitask_inference(cls_s, mp_s, tm_s, topk=Qs)
    )
    up = interpolate(mp_s.transpose(1, 2, 0)[None], size=(4 * hs, 4 * ws),
                     mode="bilinear")[0].transpose(2, 0, 1)
    inst = instance_inference(cls_s, up, Qs)
    pan = panoptic_inference(cls_s, up, tm_s, 0.8, 0.8)
    sem_arg = np.asarray(semantic_inference(cls_s, up).argmax(0))
    assert (fused["sem_seg_argmax"] != sem_arg).mean() < 3e-3
    assert (fused["panoptic_seg"] != np.asarray(pan["panoptic_seg"])).mean() < 3e-3
    np.testing.assert_allclose(fused["scores"], np.asarray(inst["scores"]),
                               atol=1e-3, rtol=1e-3)
    print("fused_postprocess parity OK", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    smoke_fused_postprocess(rng)
    if FAILURES:
        print("SMOKE FAILURES:", ", ".join(FAILURES), flush=True)
        raise SystemExit(1)
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
