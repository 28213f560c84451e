"""Model analysis: params / FLOPs / activations / speed.

Capability spec: reference tools/analyze_model.py (:61-91) — fvcore
FlopCountAnalysis, parameter table, activation counts, and a `speed` task
over fixed-size inputs (that tool is stale in the release — it imports a
nonexistent symbol; this one runs). FLOPs come from XLA's own cost analysis
of the compiled executable, which is exact for the fused program rather than
an operator-count estimate.

Usage:
  python tools/analyze_model.py --tasks flop param speed [--height 512 --width 1024]
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


def param_table(params, max_depth=2):
    rows = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            rows.append((path, node.size))

    walk(params, ())
    agg = {}
    for path, size in rows:
        key = "/".join(path[:max_depth])
        agg[key] = agg.get(key, 0) + size
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--tasks", nargs="+", default=["flop", "param"], choices=["flop", "param", "activation", "speed"])
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from uni_encoder_tpu.config import Config, load_config
    from uni_encoder_tpu.models.oneformer import UniEncoder

    cfg = load_config(args.config) if args.config else Config()
    model = UniEncoder(cfg.model)
    images = jnp.zeros((1, args.height, args.width, 3), jnp.float32)
    tasks = jnp.zeros((1, cfg.input.task_seq_len), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, tasks)

    if "param" in args.tasks:
        agg = param_table(variables["params"])
        total = sum(agg.values())
        print("\n== parameters ==")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"{k:60s} {v/1e6:10.3f} M")
        print(f"{'TOTAL':60s} {total/1e6:10.3f} M")

    fwd = jax.jit(model.apply)
    lowered = fwd.lower(variables, images, tasks)
    compiled = lowered.compile()

    if "flop" in args.tasks or "activation" in args.tasks:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        print("\n== XLA cost analysis (segmentation forward) ==")
        print(f"flops:            {cost.get('flops', float('nan'))/1e9:.2f} GFLOP")
        print(f"bytes accessed:   {cost.get('bytes accessed', float('nan'))/1e9:.3f} GB")
        mem = compiled.memory_analysis()
        if mem is not None:
            print(f"peak temp memory: {getattr(mem, 'temp_size_in_bytes', 0)/1e9:.3f} GB")
            print(f"argument memory:  {getattr(mem, 'argument_size_in_bytes', 0)/1e9:.3f} GB")

    if "speed" in args.tasks:
        out = jax.block_until_ready(fwd(variables, images, tasks))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(variables, images, tasks)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"\n== speed == {dt*1e3:.2f} ms/img ({1/dt:.2f} img/s) at {args.height}x{args.width}")


if __name__ == "__main__":
    main()
