"""Headline benchmark: Cityscapes-resolution multi-task inference throughput
on one TPU chip.

Protocol (mirrors the reference's measurement mechanisms, SURVEY.md §6 /
BASELINE.md): one "image" = the production eval work for one Cityscapes
frame — a 1024x2048 segmentation forward through the flagship model
(Swin-T -> MSDeformAttn pixel decoder -> query decoder) + full-resolution
mask upsample + semantic/panoptic/instance post-processing, plus a 192x512
two-frame depth/motion sequence forward (the DEPTH_TEST item). Steady-state,
batch 1, excludes compilation; prints one JSON line.

vs_baseline: BASELINE.md records that the reference publishes no numbers;
the driver's north star is 2x an A100 running the reference. We use
4.0 img/s as the A100 reference estimate (Mask2Former-family Swin-T
panoptic inference at 1024x2048 is ~3-5 img/s on A100-class GPUs) =>
vs_baseline = value / 4.0. Replace with a measured number when available.
"""

import json
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

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_S = 4.0

# r4/r5 hardware windows adjudicated every gated kernel (BASELINE.md
# decision tables): STREAMED_ATTN / MSDA_PALLAS_REDUCE / SWIN_FUSED_BLOCK
# were measured losers and are removed from the tree; MSDA_GATHER_SPLIT=2
# is a measured winner (7.145 vs 6.906). MSDA_LOC_PER_HEAD /
# MSDA_TABLE_PER_HEAD move per-head index math / table builds inside the
# head loop so they overlap the previous head's gathers (r5 matrix 3).
# MSDA_PMAJOR gathers point-major — the q-major index interleave relayout
# disappears and each head-level becomes P independent gather->reduce
# chains (r5 matrix 4: 9.04 vs 8.19 — but NOT the shipped default: the
# confirm session could not reproduce a green run, its remote compile sat
# 40 min without completing; see BASELINE.md matrix 4). MSDA_W16_DG keeps
# corner weights component-major via dot_general (measured neutral).
GATE_KEYS = ("MSDA_GATHER_SPLIT", "MSDA_LOC_PER_HEAD", "MSDA_TABLE_PER_HEAD",
             "MSDA_PMAJOR", "MSDA_W16_DG")
GATES_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_gates.json")


def _load_gate_defaults(path=None, environ=os.environ):
    """Apply the hardware-verified gate set as env DEFAULTS (explicit env
    always wins).

    tools/hw_session.sh benches every gated-kernel combination on the real
    chip and writes the measured winner to .bench_gates.json — so the
    flip-after-green policy holds even when the TPU window opens with no
    builder session alive to edit the in-code defaults: the driver's bench
    picks up the verified winner automatically. BENCH_IGNORE_GATES_FILE=1
    opts out (hw_session's own decision-table rows use it so the file can
    never contaminate its baseline row)."""
    if environ.get("BENCH_IGNORE_GATES_FILE") == "1":
        return False
    try:
        with open(path or GATES_FILE) as f:
            gates = json.load(f).get("gates", {})
    except (OSError, ValueError):
        return False
    applied = False
    for k in GATE_KEYS:
        if k in gates and k not in environ:
            environ[k] = str(gates[k])
            applied = True
    return applied


def main():
    if _load_gate_defaults():
        os.environ["BENCH_GATES_SOURCE"] = "decision_file"
    # Safe-mode retry: if a GATED kernel (enabled via env) makes the
    # full-context compile/run fail on this hardware, fall back once to the
    # pure-XLA form so the bench always produces a number. With every gate
    # already off (the shipped flip-after-green defaults) the retry would
    # re-run a byte-identical configuration — skip it; it cannot succeed
    # where the first run failed.
    retry = False
    gates_on = (
        os.environ.get("MSDA_GATHER_SPLIT", "1") not in ("0", "1")
        or os.environ.get("MSDA_LOC_PER_HEAD") == "1"
        or os.environ.get("MSDA_TABLE_PER_HEAD") == "1"
        or os.environ.get("MSDA_PMAJOR") == "1"
        or os.environ.get("MSDA_W16_DG") == "1"
    )
    try:
        run()
    except Exception as e:  # noqa: BLE001 — any failure: report + safe rerun
        if os.environ.get("BENCH_NO_RETRY") == "1" or not gates_on:
            raise
        print(f"# default-gate bench failed ({type(e).__name__}: {e}); "
              "retrying with all gates off", file=sys.stderr)
        retry = True
    if retry:
        # retried OUTSIDE the except block: the exception's traceback would
        # otherwise pin the failed attempt's device buffers (params, images,
        # executables) and an OOM-class failure would just OOM again
        os.environ["MSDA_GATHER_SPLIT"] = "1"
        os.environ["MSDA_LOC_PER_HEAD"] = "0"
        os.environ["MSDA_TABLE_PER_HEAD"] = "0"
        os.environ["MSDA_PMAJOR"] = "0"
        os.environ["MSDA_W16_DG"] = "0"
        run(retried=True)


def run(retried=False):
    from uni_encoder_tpu.config import Config
    from uni_encoder_tpu.data.tokenizer import tokenize_task
    from uni_encoder_tpu.inference.postprocess import (
        instance_inference,
        panoptic_inference,
        semantic_inference,
    )
    from uni_encoder_tpu.models.oneformer import UniEncoder
    from uni_encoder_tpu.ops import interpolate

    cfg = Config().model
    model = UniEncoder(cfg)
    use_bf16 = os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16"
    # serving batch size. Measured (BASELINE.md): batch=2 is NET WORSE on
    # one v5e chip (6.16 vs 6.67 img/s) — the per-image gathers and
    # full-res tensors dominate and bigger live intermediates hurt; the
    # default stays 1 (which is also the latency-optimal serving config).
    batch = int(os.environ.get("BENCH_BATCH", "1"))

    SEG_H, SEG_W = 1024, 2048
    DEP_H, DEP_W = 192, 512
    rng = np.random.RandomState(0)
    seg_img = jnp.asarray(rng.randn(batch, SEG_H, SEG_W, 3), jnp.float32)
    dep_img = jnp.asarray(rng.randn(batch, DEP_H, DEP_W, 3), jnp.float32)
    prev_img = jnp.asarray(rng.randn(batch, DEP_H, DEP_W, 3), jnp.float32)
    tasks = jnp.asarray([tokenize_task("The task is panoptic")] * batch, jnp.int32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), seg_img, tasks)
    v_seq = jax.jit(
        lambda r, a, b: model.init(r, a, b, method=UniEncoder.forward_sequence)
    )(jax.random.PRNGKey(0), dep_img, prev_img)
    # merge sequence-only params (pose/motion/depth decoders)
    params = dict(variables["params"])
    for k, v in v_seq["params"].items():
        params.setdefault(k, v)
    batch_stats = dict(v_seq.get("batch_stats", {}))
    variables = {"params": params, **({"batch_stats": batch_stats} if batch_stats else {})}
    if use_bf16:
        # bf16 params/activations; fp32 islands: deformable sampling core,
        # attention logits/softmax, norm statistics (flax upcasts)
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
        )
        seg_img = seg_img.astype(jnp.bfloat16)
        dep_img = dep_img.astype(jnp.bfloat16)
        prev_img = prev_img.astype(jnp.bfloat16)

    thing_mask = jnp.asarray(np.isin(np.arange(19), np.arange(11, 19)))

    from uni_encoder_tpu.inference.fused_postprocess import fused_multitask_inference

    @jax.jit
    def seg_step(variables, images, tasks):
        out = model.apply(variables, images, tasks)

        # fused Pallas postprocess: upsample + semantic/panoptic/instance in
        # one VMEM-resident pass (golden-tested vs the unfused pipeline in
        # tests/test_fused_postprocess.py); per-image over the batch
        def post_one(args):
            logits, masks = args
            post = fused_multitask_inference(
                logits, masks, thing_mask,
                object_mask_threshold=0.8, overlap_threshold=0.8, topk=150,
            )
            # wire format: label maps are LOSSLESS uint8 (19 classes; <=150
            # panoptic segment ids) — device->host transfer is part of the
            # serving cost and i32 maps triple it (~1 s/GB through the
            # tunnel, and PCIe DMA in any real deployment)
            return (
                post["sem_seg_argmax"].astype(jnp.uint8),
                post["panoptic_seg"].astype(jnp.uint8),
                post["scores"],
            )

        # static unroll over the (small, static) batch: lax.map is a
        # length-B scan whose operand materialization blocks fusion between
        # the decoder's mask einsums and the postprocess prologue — at
        # batch 1 the profile's direct composition measures faster than the
        # scanned one for the same math. BENCH_POST_SCAN=1 restores lax.map
        # (A/B toggle).
        if os.environ.get("BENCH_POST_SCAN") == "1":
            return jax.lax.map(post_one, (out["pred_logits"], out["pred_masks"]))
        outs = [post_one((out["pred_logits"][b], out["pred_masks"][b]))
                for b in range(out["pred_logits"].shape[0])]
        return tuple(jnp.stack([o[i] for o in outs]) for i in range(3))

    @jax.jit
    def dep_step(variables, images, prev):
        out = model.apply(variables, images, prev, method=UniEncoder.forward_sequence)
        return out["disp"], out["motion_mask"], out["complete_flow"], out["cam_T_cam"]

    # DEFAULT (hardware-adjudicated, r5 matrix in BASELINE.md): seg and
    # sequence dispatched as two programs per frame. The r3 composed
    # single-jit frame step INVERTED once the forward went fully bf16 —
    # the composed XLA program schedules the bf16 decoder/mask chain
    # ~20 ms worse than the two programs back-to-back, and the real
    # per-dispatch cost is only ~1.9 ms (tools/bench_dispatch.py).
    # Measured: split 7.710 vs composed 6.784 img/s at identical math.
    # BENCH_COMPOSED_FRAME=1 restores the composed step (A/B toggle).
    def frame_step(variables, images, tasks, dep_images, prev):
        return seg_step(variables, images, tasks), dep_step(variables, dep_images, prev)

    if os.environ.get("BENCH_COMPOSED_FRAME") == "1":
        @jax.jit
        def frame_step(variables, images, tasks, dep_images, prev):  # noqa: F811
            return seg_step(variables, images, tasks), dep_step(variables, dep_images, prev)

    # compile + sanity
    r0 = jax.tree_util.tree_map(np.asarray, seg_step(variables, seg_img, tasks))
    assert r0[0].shape == (batch, SEG_H, SEG_W), r0[0].shape
    assert np.isfinite(r0[2]).all(), "non-finite instance scores"
    jax.block_until_ready(dep_step(variables, dep_img, prev_img))

    # NOTE: through the remote-TPU tunnel, jax.block_until_ready can be a
    # no-op; materializing a small leaf on host is the reliable fence.
    def fence(r, d):
        np.asarray(r[2])
        np.asarray(d[3])

    r, d = frame_step(variables, seg_img, tasks, dep_img, prev_img)
    fence(r, d)

    # 30 iterations: at 10 the queue-and-fence protocol still shows ±1.5%
    # run-to-run spread through the tunnel (measured 6.478/6.618/6.559 on an
    # identical binary); 30 tightens it below ±0.5%
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        r, d = frame_step(variables, seg_img, tasks, dep_img, prev_img)
    fence(r, d)  # drains the queue: all iterations complete before the stop
    dt = (time.perf_counter() - t0) / (iters * batch)

    img_per_s = 1.0 / dt
    # effective gate set in the record: a safe-mode-retried run must be
    # distinguishable from a default-gates success when scraping stdout
    # (the hw_session decision table and the driver both parse this line)
    gates = {k: os.environ[k] for k in GATE_KEYS if k in os.environ}
    record = {
        "metric": "cityscapes_1024x2048_multitask_inference",
        "value": round(img_per_s, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 3),
        # the denominator is an ESTIMATE (no A100 in this env; the reference
        # publishes no numbers — see BASELINE.md "North star")
        "baseline_source": "estimate_4.0_a100",
        "batch": batch,
    }
    if gates:
        record["gates"] = gates
    if os.environ.get("BENCH_GATES_SOURCE"):
        record["gates_source"] = os.environ["BENCH_GATES_SOURCE"]
    if retried:
        record["retried"] = True
    print(json.dumps(record))


if __name__ == "__main__":
    main()
