"""Compile-only diagnosis of the composed-graph overhead (r5).

The composed seg graph (backbone -> pixel decoder -> query decoder -> fused
postprocess) nets ~131 ms on the chip vs ~114 ms for the sum of its isolated
stages. This tool AOT-compiles the isolated stages and the composed graph
(no execution) and prints, for each: instruction-category counts from the
optimized HLO (copies / transposes / fusions / gathers) and the XLA
memory_analysis (peak / temp allocation), to show what the compiler does
differently when the stages are fused into one program.

Usage: python tools/analyze_composition.py [name ...]
  names: backbone, decoder, qdec, post, seg_full (default: all)
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uni_encoder_tpu.utils.cache import probe_axon_relay, setup_compile_cache

probe_axon_relay()
setup_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def report(name, fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    hlo = compiled.as_text()
    # count instruction definitions per category ("%x = ty category(...)")
    cats = {}
    for m in re.finditer(r"= \S+ ([a-z][a-z0-9-]*)\(", hlo):
        cats[m.group(1)] = cats.get(m.group(1), 0) + 1
    mem = compiled.memory_analysis()
    interesting = ("copy", "transpose", "fusion", "gather", "convolution",
                   "dot", "custom-call", "reshape", "bitcast")
    line = " ".join(f"{k}={cats.get(k, 0)}" for k in interesting)
    print(f"{name}:")
    print(f"  {line}")
    try:
        print(f"  temp={mem.temp_size_in_bytes/1e6:.1f}MB "
              f"args={mem.argument_size_in_bytes/1e6:.1f}MB "
              f"out={mem.output_size_in_bytes/1e6:.1f}MB "
              f"peak? gen={mem.generated_code_size_in_bytes/1e6:.2f}MB")
    except Exception as e:  # memory_analysis fields vary by backend
        print(f"  memory_analysis unavailable: {e}")
    return cats


def main():
    which = set(sys.argv[1:]) or {"all"}
    rng = np.random.RandomState(0)
    from uni_encoder_tpu.config import Config
    from uni_encoder_tpu.models.oneformer import UniEncoder
    from uni_encoder_tpu.data.tokenizer import tokenize_task
    from uni_encoder_tpu.models.backbones.swin import SwinTransformer
    from uni_encoder_tpu.models.pixel_decoders.msdeformattn import (
        MSDeformAttnPixelDecoder,
    )
    from uni_encoder_tpu.inference.fused_postprocess import (
        fused_multitask_inference,
    )

    cfg = Config().model
    model = UniEncoder(cfg)
    SEG_H, SEG_W = 1024, 2048
    img = jnp.asarray(rng.randn(1, SEG_H, SEG_W, 3), jnp.bfloat16)
    tasks = jnp.asarray([tokenize_task("The task is panoptic")], jnp.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), img.astype(jnp.float32), tasks)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    params = variables["params"]
    thing_mask = jnp.asarray(np.isin(np.arange(19), np.arange(11, 19)))

    bb = SwinTransformer()
    bb_params = {"params": params["backbone"]}
    pd = MSDeformAttnPixelDecoder()
    pd_params = {"params": params["pixel_decoder"]}

    if which & {"backbone", "all"}:
        report("backbone", lambda v, x: bb.apply(v, x), bb_params, img)
    feats = jax.jit(lambda v, x: bb.apply(v, x))(bb_params, img)
    if which & {"decoder", "all"}:
        report("pixel decoder", lambda v, f: pd.apply(v, f), pd_params, feats)

    if which & {"seg_full", "all"}:
        def seg_full(v, im, tk):
            out = model.apply(v, im, tk)
            post = fused_multitask_inference(
                out["pred_logits"][0], out["pred_masks"][0], thing_mask,
                object_mask_threshold=0.8, overlap_threshold=0.8, topk=150,
            )
            return (post["sem_seg_argmax"].astype(jnp.uint8),
                    post["panoptic_seg"].astype(jnp.uint8), post["scores"])

        report("seg_full (composed)", seg_full, variables, img, tasks)


if __name__ == "__main__":
    main()
