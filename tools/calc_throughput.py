"""Training throughput benchmark.

Capability spec: reference tools/calc_throughput.py + tools/trainers/
trainer_base.py:72-105 — run the real training step for N iterations on a
fixed batch and report `img/sec = (iter - 5) * IMS_PER_BATCH / elapsed`
with the timer starting at iteration 4. (The reference tool is stale — it
imports a mapper that doesn't exist; this one runs, on synthetic batches so
it measures pure step time like a compiled-input trainer.)

Usage:
  python tools/calc_throughput.py [--iters 30] [--batch 8] [--height 192 --width 512]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--targets", type=int, default=20)
    args = ap.parse_args()

    from uni_encoder_tpu.config import Config, load_config
    from uni_encoder_tpu.training.train_step import Trainer

    cfg = load_config(args.config) if args.config else Config()
    trainer = Trainer(cfg)

    B, H, W, N = args.batch, args.height, args.width, args.targets
    rng = np.random.RandomState(0)
    seg_batch = {
        "images": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "task_tokens": jnp.ones((B, 77), jnp.int32),
        # per-query text list: num_queries - n_ctx entries per image
        "text_tokens": jnp.ones(
            (B, cfg.model.one_former.num_object_queries - cfg.model.text_encoder.n_ctx, 77),
            jnp.int32,
        ),
        "labels": jnp.asarray(rng.randint(0, 19, (B, N)), jnp.int32),
        "masks": jnp.asarray(rng.rand(B, N, H // 4, W // 4) > 0.5),
        "valid": jnp.ones((B, N), bool),
    }
    K = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    K[:, 0, 0] = K[:, 1, 1] = 300.0
    K[:, 0, 2], K[:, 1, 2] = W / 2, H / 2
    seq_batch = {
        "images": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32) * 0.1,
        "prev_images": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32) * 0.1,
        "next_images": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32) * 0.1,
        "K": jnp.asarray(K),
        "inv_K": jnp.asarray(np.linalg.inv(K)),
    }

    state = trainer.init(jax.random.PRNGKey(0), seg_batch, seq_batch)
    step = jax.jit(trainer.train_step)

    t_start = None
    for it in range(args.iters):
        state, metrics = step(state, seg_batch, seq_batch, jax.random.PRNGKey(it))
        if it == 4:
            # fence via a host scalar fetch: block_until_ready can be a
            # no-op through the axon tunnel (see BASELINE.md harness notes)
            float(metrics["loss"])
            t_start = time.perf_counter()
    float(metrics["loss"])
    elapsed = time.perf_counter() - t_start
    # one "step" consumes a seg batch AND a seq batch (BalancedSampler 1:1)
    imgs = (args.iters - 5) * 2 * B
    print(f"loss={float(metrics['loss']):.4f}")
    print(f"throughput: {imgs / elapsed:.2f} img/s ({elapsed / (args.iters - 5) * 1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
