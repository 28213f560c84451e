"""Measure per-dispatch overhead through the TPU tunnel as a function of
argument-pytree size.

Motivation (r5): the per-stage profile sums to ~124 ms/frame but the bench
measures 144.6 ms/frame. The profiler amortizes dispatch with an in-graph
scan; the bench issues 30 real dispatches whose args include the full
~700-leaf variables pytree. If per-leaf handle serialization costs ~30 us,
that alone is ~20 ms/frame — a harness/runtime cost, not device time. This
bench separates the two: a trivial kernel dispatched with (a) 2 leaves,
(b) a 700-leaf dummy pytree of tiny arrays, (c) the real flagship variables.

Queue-and-fence protocol identical to bench.py (30 dispatches, one host
fetch at the end), so numbers are directly comparable.
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

ITERS = 30


def measure(name, fn, args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # compile + fence
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # drain queue
    dt = (time.perf_counter() - t0) / ITERS * 1000.0
    print(f"{name:44s} {dt:8.2f} ms/dispatch")
    return dt


def main():
    x = jnp.ones((128, 128), jnp.bfloat16)

    @jax.jit
    def tiny(x):
        return jnp.sum(x * 1.0000001)

    measure("tiny kernel, 1 leaf", tiny, (x,))

    # 700 tiny leaves, roughly the flagship param-tree leaf count
    dummy = {f"p{i}": jnp.ones((8, 8), jnp.bfloat16) for i in range(700)}

    @jax.jit
    def many(tree, x):
        return jnp.sum(x) + jnp.sum(tree["p0"])

    measure("tiny kernel, 701 leaves", many, (dummy, x))

    # the real flagship variables pytree (init once, ~47M params)
    from uni_encoder_tpu.config import Config
    from uni_encoder_tpu.models.oneformer import UniEncoder
    from uni_encoder_tpu.data.tokenizer import tokenize_task

    model = UniEncoder(Config().model)
    img = jnp.zeros((1, 64, 128, 3), jnp.float32)
    tasks = jnp.asarray([tokenize_task("The task is panoptic")], jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, tasks)
    n = len(jax.tree_util.tree_leaves(variables))

    @jax.jit
    def withvars(v, x):
        leaf = jax.tree_util.tree_leaves(v)[0]
        return jnp.sum(x) + jnp.sum(leaf).astype(jnp.float32)

    measure(f"tiny kernel, flagship variables ({n} leaves)", withvars,
            (variables, x))


if __name__ == "__main__":
    main()
