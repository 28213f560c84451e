"""Checkpoint conversion CLI.

Capability spec: reference tools/convert-pretrained-model-to-d2.py,
convert-torchvision-to-d2.py, single2double_inputs.py,
merge_two_pretrained_models.py — all folded into one tool that converts /
merges d2 .pkl / torch .pth state dicts into a native orbax checkpoint.

Usage:
  python tools/convert_checkpoint.py model.pkl [pose.pkl ...] -o out_ckpt/ \
      [--duplicate-conv backbone.patch_embed.proj.weight] [--backbone swin]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uni_encoder_tpu.utils.cache import probe_axon_relay, setup_compile_cache

probe_axon_relay()

setup_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+", help=".pkl/.pth state dicts (later ones win on conflicts)")
    ap.add_argument("-o", "--output", required=True, help="orbax checkpoint dir")
    ap.add_argument("--backbone", default="swin", choices=["swin", "resnet", "convnext", "dinat"])
    ap.add_argument(
        "--duplicate-conv",
        default=None,
        help="duplicate a conv's input channels 3->6 (single2double_inputs equivalent)",
    )
    args = ap.parse_args()

    from uni_encoder_tpu.engine import checkpoint as ckpt

    states = [ckpt.load_reference_state(p) for p in args.inputs]
    state = ckpt.merge_states(*states)
    if args.duplicate_conv:
        state = ckpt.duplicate_input_conv(state, args.duplicate_conv)

    c = ckpt.Converter(state)
    if args.backbone == "swin":
        ckpt.convert_swin(c)
    elif args.backbone == "resnet":
        ckpt.convert_resnet(c)
    elif args.backbone == "dinat":
        ckpt.convert_dinat(c)
    else:
        ckpt.convert_convnext(c)
    ckpt.convert_msdeform_pixel_decoder(c)
    ckpt.convert_query_decoder(c)
    ckpt.convert_transdssl(c)
    ckpt.convert_pose_decoder(c)
    ckpt.convert_motion_decoder(c, "motion_decoder")
    ckpt.convert_motion_decoder(c, "motion_mask")
    ckpt.convert_task_mlp(c)

    if c.unused:
        print(f"WARNING: {len(c.unused)} source keys not converted:")
        for k in sorted(c.unused)[:20]:
            print(f"  {k}")

    n = sum(x.size for x in _leaves(c.params))
    print(f"converted {n/1e6:.2f} M params -> {args.output}")
    ckpt.save_checkpoint(args.output, {"params": c.params, "batch_stats": c.batch_stats})


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
