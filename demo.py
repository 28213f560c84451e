"""Demo CLI.

Capability spec: reference demo/demo.py (:88-154): seeded deterministic run,
globs input images, derives the previous frame path by filename arithmetic
(frame - 2 in leftImg8bit_sequence), runs the two-pass predictor, saves one
output directory per requested visualization, logs per-image latency.

Usage:
  python demo.py --config configs/cityscapes_swin_unified.yaml \
      --input 'path/to/*.png' --output out/ [--task panoptic] [--weights ckpt]
"""

import argparse
import glob
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# fail fast on a dead axon relay BEFORE importing jax (a half-open relay
# hangs backend discovery ~25 min), then enable the TPU-only persistent
# compile cache — see uni_encoder_tpu/utils/cache.py for both
from uni_encoder_tpu.utils.cache import probe_axon_relay, setup_compile_cache

probe_axon_relay()

import jax

setup_compile_cache(os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from PIL import Image

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
logger = logging.getLogger("demo")


def prev_frame_path(path: str, offset: int = -2):
    """cityscapes naming: city_seq_frame_leftImg8bit.png; previous frame lives
    in leftImg8bit_sequence (reference demo.py:114-121)."""
    base = os.path.basename(path)
    parts = base.split("_")
    if len(parts) < 4:
        return None
    try:
        parts[2] = str(int(parts[2]) + offset).zfill(6)
    except ValueError:
        return None
    prev = os.path.join(os.path.dirname(path), "_".join(parts))
    if os.path.isfile(prev):
        return prev
    seq = prev.replace("leftImg8bit/", "leftImg8bit_sequence/")
    return seq if os.path.isfile(seq) else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--input", required=True, help="glob of input images")
    ap.add_argument("--output", required=True)
    ap.add_argument("--task", default="panoptic", choices=["panoptic", "semantic", "instance"])
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    np.random.seed(42)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from uni_encoder_tpu.config import Config, load_config
    from uni_encoder_tpu.demo.predictor import VisualizationDemo
    from uni_encoder_tpu.models.oneformer import UniEncoder

    cfg = load_config(args.config, args.opts) if args.config else Config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, is_demo=True))

    model = UniEncoder(cfg.model)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)), jnp.zeros((1, 77), jnp.int32)
    )
    v_seq = jax.jit(lambda r, a, b: model.init(r, a, b, method=UniEncoder.forward_sequence))(
        jax.random.PRNGKey(0), jnp.zeros((1, 192, 512, 3)), jnp.zeros((1, 192, 512, 3))
    )
    params = dict(variables["params"])
    for k, v in v_seq["params"].items():
        params.setdefault(k, v)
    variables = {"params": params, "batch_stats": dict(v_seq.get("batch_stats", {}))}

    if args.weights:
        from uni_encoder_tpu.engine import checkpoint as ckpt

        if args.weights.endswith((".pkl", ".pth")):
            state = ckpt.load_reference_state(args.weights)
            p, bs, unused = ckpt.convert_reference_checkpoint(state)
            variables = {"params": p, "batch_stats": bs}
        else:
            variables = ckpt.load_checkpoint(args.weights, variables)
        logger.info(f"loaded {args.weights}")

    demo = VisualizationDemo(cfg, variables)
    paths = sorted(glob.glob(args.input))
    assert paths, f"no inputs match {args.input}"

    for path in paths:
        t0 = time.time()
        image = np.asarray(Image.open(path).convert("RGB"))
        prev_path = prev_frame_path(path)
        prev = np.asarray(Image.open(prev_path).convert("RGB")) if prev_path else None
        outputs = demo.run_on_image(image, prev, args.task)
        for name, img in outputs.items():
            out_dir = os.path.join(args.output, name)
            os.makedirs(out_dir, exist_ok=True)
            Image.fromarray(img).save(os.path.join(out_dir, os.path.basename(path)))
        logger.info(f"{path}: {len(outputs)} outputs in {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
