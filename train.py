"""Training entry point.

The reference release is eval-only (train_net.py:283 hard-asserts
eval_only; no criterion ships). This trainer completes the capability: the
balanced seg+sequence loop (BalancedSampler 1:1), the OneFormer-style set
criterion + contrastive text branch, the 7-term self-supervised monodepth
loss, AdamW with 0.1x backbone LR / poly schedule / 0.01 full-model grad
clip, data-parallel pjit over the device mesh, periodic orbax checkpoints
and metric writers.

Usage:
  python train.py --config configs/cityscapes_swin_unified.yaml \
      --output-dir runs/exp1 [--max-iter 1000] [opts ...]
"""

import argparse
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

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
logger = logging.getLogger("train")


def stack_batch(items):
    import jax.numpy as jnp

    keys = items[0].keys()
    return {k: jnp.asarray(np.stack([it[k] for it in items])) for k in keys if k != "task"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--output-dir", default="runs/default")
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None, help="override ims_per_batch")
    ap.add_argument("--datasets-root", default=None)
    ap.add_argument("--checkpoint-period", type=int, default=5000)
    ap.add_argument("--log-period", type=int, default=20)
    ap.add_argument("--num-devices", type=int, default=None,
                    help="limit the data-parallel mesh to the first N devices "
                         "(default: all; per-modality batch must divide by it)")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from uni_encoder_tpu.config import Config, load_config
    from uni_encoder_tpu.data import datasets as dataset_registry
    from uni_encoder_tpu.data.catalog import DatasetCatalog
    from uni_encoder_tpu.data.train_mappers import (
        BalancedSampler,
        SegmentationTrainMapper,
        SequenceTrainMapper,
    )
    from uni_encoder_tpu.engine import checkpoint as ckpt
    from uni_encoder_tpu.engine.events import (
        CommonMetricPrinter,
        EventStorage,
        JSONWriter,
        MLflowWriter,
    )
    from uni_encoder_tpu.parallel.mesh import batch_shardings, make_mesh
    from uni_encoder_tpu.training.train_step import Trainer

    cfg = load_config(args.config, args.opts) if args.config else Config()
    max_iter = args.max_iter or cfg.solver.max_iter
    batch = args.batch or max(2, cfg.solver.ims_per_batch // 2)  # per modality

    dataset_registry.register_all(args.datasets_root)
    seg_items = []
    seq_items = []
    for name in cfg.datasets.train:
        try:
            items = DatasetCatalog.get(name)
        except (FileNotFoundError, KeyError) as e:
            logger.warning(f"train dataset {name} unavailable: {e}")
            continue
        (seq_items if items and items[0]["type"] == "sequence" else seg_items).extend(items)
    # sequence sets usually registered separately
    for name in ("cityscapes_sequence_crop_full_sequence_train",):
        if not seq_items:
            try:
                seq_items = DatasetCatalog.get(name)
            except (FileNotFoundError, KeyError):
                pass
    assert seg_items and seq_items, "need both segmentation and sequence train data"

    seg_mapper = SegmentationTrainMapper(
        crop_size=tuple(cfg.input.seg_crop_train),
        min_sizes=tuple(cfg.input.seg_min_size_train),
        max_size=cfg.input.seg_max_size_train,
        num_texts=cfg.model.one_former.num_object_queries - cfg.model.text_encoder.n_ctx,
    )
    seq_mapper = SequenceTrainMapper(hw=tuple(cfg.input.depth_hw_train))
    sampler = iter(BalancedSampler(seg_items, seq_items))

    def next_batches():
        seg, seq = [], []
        while len(seg) < batch or len(seq) < batch:
            kind, item = next(sampler)
            try:
                if kind == "segmentation" and len(seg) < batch:
                    seg.append(seg_mapper(item))
                elif kind == "sequence" and len(seq) < batch:
                    seq.append(seq_mapper(item))
            except (FileNotFoundError, OSError) as e:
                logger.warning(f"skipping unreadable item: {e}")
        return stack_batch(seg), stack_batch(seq)

    mesh = make_mesh(args.num_devices)
    assert batch % mesh.shape["data"] == 0, (
        f"per-modality batch {batch} must divide the data-parallel axis "
        f"({mesh.shape['data']} devices) — adjust --batch/--num-devices"
    )
    trainer = Trainer(cfg)
    seg_b, seq_b = next_batches()
    with mesh:
        state = trainer.init(jax.random.PRNGKey(0), seg_b, seq_b)
        # commit the fresh state replicated over the mesh BEFORE the first
        # step: init returns single-device-committed arrays, and jit would
        # otherwise specialize the first call to that layout and recompile
        # the whole train step at iteration 1 when the mesh-committed output
        # state comes back (one extra multi-minute compile on TPU)
        from jax.sharding import NamedSharding, PartitionSpec

        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
        step_fn = jax.jit(trainer.train_step)

        storage = EventStorage()
        writers = [
            CommonMetricPrinter(max_iter),
            JSONWriter(os.path.join(args.output_dir, "metrics.json")),
            MLflowWriter(args.output_dir, args.checkpoint_period),
        ]

        t_data = 0.0
        t0 = time.perf_counter()
        for it in range(max_iter):
            td = time.perf_counter()
            seg_b, seq_b = next_batches()
            seg_b = jax.device_put(seg_b, batch_shardings(mesh, seg_b))
            seq_b = jax.device_put(seq_b, batch_shardings(mesh, seq_b))
            t_data += time.perf_counter() - td

            state, metrics = step_fn(state, seg_b, seq_b, jax.random.PRNGKey(it))

            if (it + 1) % args.log_period == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                elapsed = time.perf_counter() - t0
                storage.put_scalars(**metrics, data_time=t_data / args.log_period,
                                    img_per_s=args.log_period * 2 * batch / elapsed)
                for wr in writers:
                    wr.write(storage)
                t_data, t0 = 0.0, time.perf_counter()
            if (it + 1) % args.checkpoint_period == 0 or it + 1 == max_iter:
                ckpt.save_checkpoint(
                    args.output_dir,
                    {"params": state.params, "batch_stats": state.batch_stats,
                     "text_params": state.text_params},
                    step=it + 1,
                )
            storage.step()

    logger.info("training done")


if __name__ == "__main__":
    main()
