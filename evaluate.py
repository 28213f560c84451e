"""Evaluation entry point (the reference's `train_net.py --eval-only`).

Mirrors Trainer.test (reference train_net.py:188-257): iterates
DATASETS.DEPTH_TEST + DATASETS.SEG_TEST_{TASK}, builds the evaluator for
each dataset's evaluator_type, runs single-image inference, and merges all
metrics under "seg_and_depth". Model weights load from an orbax checkpoint
or a converted d2 .pkl/.pth.

Usage:
  python evaluate.py --config configs/cityscapes_swin_unified.yaml \
      --weights /path/to/ckpt [--task panoptic] [opts a.b.c=v ...]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# fail fast on a dead axon relay BEFORE importing jax (a half-open relay
# hangs backend discovery ~25 min), then enable the TPU-only persistent
# compile cache — see uni_encoder_tpu/utils/cache.py for both
from uni_encoder_tpu.utils.cache import probe_axon_relay, setup_compile_cache

probe_axon_relay()

import jax

setup_compile_cache(os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
logger = logging.getLogger("evaluate")


def build_evaluator(dataset_name: str, task: str):
    from uni_encoder_tpu.data.catalog import MetadataCatalog
    from uni_encoder_tpu.evaluation.cityscapes import (
        CityscapesDepthEvaluator,
        CityscapesInstanceEvaluator,
        CityscapesPanopticEvaluator,
        CityscapesSemSegEvaluator,
    )
    from uni_encoder_tpu.evaluation.evaluator import DatasetEvaluators
    from uni_encoder_tpu.evaluation.kitti import KITTIDepthEvaluator

    etype = MetadataCatalog.get(dataset_name).get("evaluator_type")
    if etype == "coco_instance":
        from uni_encoder_tpu.evaluation.coco import COCOInstanceEvaluator

        return COCOInstanceEvaluator(dataset_name)
    if etype == "cityscapes_depth":
        return CityscapesDepthEvaluator(dataset_name)
    if etype == "kitti_depth":
        return KITTIDepthEvaluator(dataset_name)
    if etype == "sem_seg":
        return CityscapesSemSegEvaluator(dataset_name)
    if etype == "ade20k_panoptic_seg":
        # reference train_net.py:92-149: COCOPanopticEvaluator + SemSegEvaluator
        # (+ InstanceSegEvaluator over the COCO-format instance json)
        from uni_encoder_tpu.evaluation.coco import COCOInstanceEvaluator

        n_things = len(MetadataCatalog.get(dataset_name).get("instance_classes") or []) or 100
        evals = []
        if task == "semantic":
            evals.append(CityscapesSemSegEvaluator(dataset_name))
        elif task == "instance":
            evals.append(COCOInstanceEvaluator(dataset_name, num_classes=n_things))
        else:
            # Reference-comparable ADE20K instance AP requires predictions
            # made with the INSTANCE task token (the reference gates its
            # label remap on 'instance' in task_type); a panoptic-task run
            # therefore reports PQ + mIoU only — run --task instance for AP.
            evals.append(CityscapesPanopticEvaluator(dataset_name))
            evals.append(CityscapesSemSegEvaluator(dataset_name))
        return DatasetEvaluators(evals)
    if etype in ("cityscapes_panoptic_seg", "cityscapes_sem_seg", "cityscapes_instance"):
        evals = []
        if task == "semantic":
            evals.append(CityscapesSemSegEvaluator(dataset_name))
        elif task == "instance":
            evals.append(CityscapesInstanceEvaluator(dataset_name))
        else:
            evals.append(CityscapesPanopticEvaluator(dataset_name))
            evals.append(CityscapesSemSegEvaluator(dataset_name))
            evals.append(CityscapesInstanceEvaluator(dataset_name))
        return DatasetEvaluators(evals)
    raise ValueError(f"no evaluator for type {etype!r} (dataset {dataset_name})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--task", default=None, choices=[None, "panoptic", "semantic", "instance"])
    ap.add_argument("--datasets-root", default=None)
    ap.add_argument("--max-images", type=int, default=None, help="debug: cap per-dataset images")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    from uni_encoder_tpu.config import Config, load_config
    from uni_encoder_tpu.data import datasets as dataset_registry
    from uni_encoder_tpu.data.build import build_test_loader
    from uni_encoder_tpu.data.catalog import MetadataCatalog
    from uni_encoder_tpu.data.mappers import TestMapper
    from uni_encoder_tpu.engine.predictor import Predictor
    from uni_encoder_tpu.evaluation.evaluator import inference_on_dataset
    from uni_encoder_tpu.models.oneformer import UniEncoder

    cfg = load_config(args.config, args.opts) if args.config else Config()
    if args.task:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, test=dataclasses.replace(cfg.model.test, task=args.task))
        )
    task = cfg.model.test.task

    if cfg.model.dtype == "float32":
        jax.config.update("jax_default_matmul_precision", "highest")

    dataset_registry.register_all(args.datasets_root)

    # ---- build model + weights
    model = UniEncoder(cfg.model)
    seg_shape = (1, 256, 512, 3)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros(seg_shape), jnp.zeros((1, cfg.input.task_seq_len), jnp.int32)
    )
    v_seq = jax.jit(
        lambda r, a, b: model.init(r, a, b, method=UniEncoder.forward_sequence)
    )(jax.random.PRNGKey(0), jnp.zeros((1, 192, 512, 3)), jnp.zeros((1, 192, 512, 3)))
    params = dict(variables["params"])
    for k, v in v_seq["params"].items():
        params.setdefault(k, v)
    variables = {"params": params, "batch_stats": dict(v_seq.get("batch_stats", {}))}

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logger.info(f"Total Params: {n_params/1e6:.2f} M")

    weights = args.weights or cfg.model.weights
    if weights:
        from uni_encoder_tpu.engine import checkpoint as ckpt

        if weights.endswith((".pkl", ".pth")):
            state = ckpt.load_reference_state(weights)
            params_c, bstats, unused = ckpt.convert_reference_checkpoint(state)
            if unused:
                logger.warning(f"{len(unused)} unconverted reference keys, e.g. {sorted(unused)[:5]}")
            variables = {"params": params_c, "batch_stats": bstats}
        else:
            variables = ckpt.load_checkpoint(weights, variables)
        logger.info(f"loaded weights from {weights}")
    else:
        logger.warning("no weights given — evaluating a randomly initialized model")

    predictor = Predictor(cfg, variables)

    # ---- dataset list: depth first, then per-task seg (reference :205-214)
    seg_sets = {
        "panoptic": cfg.datasets.seg_test_panoptic,
        "semantic": cfg.datasets.seg_test_semantic,
        "instance": cfg.datasets.seg_test_instance,
    }[task]
    results = {}
    for name in list(cfg.datasets.depth_test) + list(seg_sets):
        meta = MetadataCatalog.get(name)
        etype = meta.get("evaluator_type")
        is_depth = etype in ("cityscapes_depth", "kitti_depth")
        mapper = TestMapper(
            task=task,
            seg_min_size=cfg.input.seg_min_size_test,
            seg_max_size=cfg.input.seg_max_size_test,
            sequence_hw=(192, 640) if etype == "kitti_depth" else (192, 512),
            task_seq_len=cfg.input.task_seq_len,
        )
        try:
            loader = build_test_loader(
                name, mapper, rank=jax.process_index(), world=jax.process_count()
            )
        except (FileNotFoundError, KeyError) as e:
            logger.warning(f"skipping {name}: {e}")
            continue
        if args.max_images:
            loader.items = loader.items[: args.max_images]
        if not is_depth:
            thing_ids = sorted(meta.get("thing_dataset_id_to_contiguous_id", {}).values())
            predictor.set_thing_ids(thing_ids, dataset_name=name)
        if is_depth:
            run = predictor.infer_sequence
        elif cfg.model.test.aug_enabled and task == "semantic":
            from uni_encoder_tpu.engine.tta import SemanticTTA

            run = SemanticTTA(
                predictor,
                cfg.model.test.aug_min_sizes,
                cfg.model.test.aug_max_size,
                cfg.model.test.aug_flip,
            )
        else:
            run = predictor.infer_segmentation
        logger.info(f"evaluating {name} ({len(loader)} images, task={task})")
        r = inference_on_dataset(run, loader, build_evaluator(name, task))
        results[name] = r

    merged = {"seg_and_depth": {}}
    for name, r in results.items():
        for k, v in r.items():
            merged["seg_and_depth"][f"{name}/{k}"] = v
    logger.info("==== results ====")
    for k, v in merged["seg_and_depth"].items():
        logger.info(f"{k}: {v}")
    return merged


if __name__ == "__main__":
    main()
