"""Per-stage profiler for the flagship inference path on one TPU chip.

Times each pipeline stage in isolation with the host-fetch fence that is
reliable through the remote-TPU tunnel (see BASELINE.md / utils cost notes:
jax.block_until_ready can be a no-op there). Each timed fn is wrapped in a
lax.scan over ITERS in-graph iterations with a carry data-dependency so the
per-call tunnel overhead (~30 ms) amortizes away.

Usage: python tools/profile_stages.py [stage ...]
  stages: backbone, decoder, layer, msda, qdec, post, seq, cum2, cum3, frame, all
  (frame = the bench's full seg+postprocess step and the whole frame_step,
  to expose glue/scheduling cost the per-stage rows don't see)
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

ITERS = 8


def timed(name, fn, *args):
    """fn: pytree -> pytree; scanned ITERS times with a data dependency."""

    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*c[1])
            # fold a nonzero epsilon of the output into EVERY float leaf so
            # no stage is loop-invariant (XLA would hoist it out of the scan
            # and the measurement would be bogus-low)
            leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

            def perturb(x):
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                    return x + (s * 1e-30).astype(x.dtype)
                return x

            return (c[0] + s, jax.tree_util.tree_map(perturb, c[1])), None

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0.0), args), None, length=ITERS)
        return acc

    # compile
    float(run(args))
    t0 = time.perf_counter()
    float(run(args))
    dt = (time.perf_counter() - t0) / ITERS * 1000.0
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    which = set(sys.argv[1:]) or {"all"}
    rng = np.random.RandomState(0)
    # harness floor (scalar-dependency pipeline drain, ~3 ms/iter): subtract
    # this from every row below when reading absolute per-stage costs
    timed("null (harness floor)", lambda x: x * 1.0000001,
          jnp.ones((8, 128), jnp.float32))
    from uni_encoder_tpu.config import Config
    from uni_encoder_tpu.models.oneformer import UniEncoder
    from uni_encoder_tpu.data.tokenizer import tokenize_task

    cfg = Config().model
    model = UniEncoder(cfg)
    SEG_H, SEG_W = 1024, 2048
    img = jnp.asarray(rng.randn(1, SEG_H, SEG_W, 3), jnp.bfloat16)
    tasks = jnp.asarray([tokenize_task("The task is panoptic")], jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img.astype(jnp.float32), tasks)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
    )
    params = variables["params"]

    # ---- backbone
    from uni_encoder_tpu.models.backbones.swin import SwinTransformer

    bb = SwinTransformer()
    bb_params = {"params": params["backbone"]}
    if which & {"backbone", "all"}:
        timed("backbone swin-t 1024x2048", lambda v, x: bb.apply(v, x), bb_params, img)

    feats = jax.jit(lambda v, x: bb.apply(v, x))(bb_params, img)
    feats = jax.tree_util.tree_map(lambda x: x, feats)

    # ---- pixel decoder
    from uni_encoder_tpu.models.pixel_decoders.msdeformattn import (
        MSDeformAttnPixelDecoder,
        MSDeformAttnEncoderLayer,
    )

    pd = MSDeformAttnPixelDecoder()
    pd_params = {"params": params["pixel_decoder"]}
    if which & {"decoder", "all"}:
        timed("pixel decoder (6-layer msda + fpn)", lambda v, f: pd.apply(v, f), pd_params, feats)

    # ---- one encoder layer at production shapes
    shapes = ((32, 64), (64, 128), (128, 256))
    S = sum(h * w for h, w in shapes)
    C = 256
    if which & {"layer", "all"}:
        layer = MSDeformAttnEncoderLayer()
        src = jnp.asarray(rng.randn(1, S, C), jnp.bfloat16)
        pos = jnp.asarray(rng.randn(1, S, C), jnp.bfloat16)
        from uni_encoder_tpu.models.pixel_decoders.msdeformattn import _reference_points

        refp = jnp.asarray(_reference_points(shapes))
        lv = layer.init(jax.random.PRNGKey(0), src, pos, refp, shapes)
        lv = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, lv
        )
        timed(
            "msda encoder layer",
            lambda v, s, p: layer.apply(v, s, p, refp, shapes),
            lv, src, pos,
        )

    # ---- raw msda op
    if which & {"msda", "all"}:
        from uni_encoder_tpu.ops import ms_deform_attn

        B, M, D, L, P = 1, 8, 32, 3, 4
        value = jnp.asarray(rng.randn(B, S, M, D), jnp.bfloat16)
        loc = jnp.asarray(rng.rand(B, S, M, L, P, 2), jnp.float32)
        w = jax.nn.softmax(jnp.asarray(rng.randn(B, S, M, L * P), jnp.float32)).reshape(
            B, S, M, L, P
        )
        timed(
            "ms_deform_attn op (S=43008)",
            lambda v, l, ww: ms_deform_attn(v, shapes, l, ww),
            value, loc, w,
        )

    # ---- query decoder
    if which & {"qdec", "all"}:
        from uni_encoder_tpu.models.transformer_decoder import OneFormerQueryDecoder

        pdo = jax.jit(lambda v, f: pd.apply(v, f))(pd_params, feats)
        mask_features, _, multi_scale = pdo
        qd = OneFormerQueryDecoder()
        task_emb = jnp.asarray(rng.randn(1, 256), jnp.bfloat16)

        qv = {"params": params["predictor"]}
        def run_qdec(v, ms, mf, te):
            o = qd.apply(v, ms, mf, te)
            return o["pred_logits"], o["pred_masks"]

        try:
            timed("query decoder (9+1 layers)", run_qdec, qv, multi_scale, mask_features, task_emb)
        except Exception as e:
            print("qdec profile failed:", type(e).__name__, str(e)[:200])

    # ---- postprocess
    if which & {"post", "all"}:
        from uni_encoder_tpu.inference.postprocess import (
            instance_inference,
            panoptic_inference,
            semantic_inference,
        )
        from uni_encoder_tpu.ops import interpolate

        logits = jnp.asarray(rng.randn(150, 20), jnp.bfloat16)
        masks_small = jnp.asarray(rng.randn(150, 256, 512), jnp.bfloat16)
        thing_mask = jnp.asarray(np.isin(np.arange(19), np.arange(11, 19)))

        def post(lg, mk):
            masks = interpolate(
                mk.transpose(1, 2, 0)[None], size=(SEG_H, SEG_W), mode="bilinear"
            )[0].transpose(2, 0, 1)
            sem = semantic_inference(lg, masks)
            pan = panoptic_inference(lg, masks, thing_mask, 0.8, 0.8)
            inst = instance_inference(lg, masks, 150)
            return sem.argmax(0).astype(jnp.int32), pan["panoptic_seg"], inst["scores"]

        timed("postprocess (upsample+sem+pan+inst)", post, logits, masks_small)

        from uni_encoder_tpu.inference.fused_postprocess import fused_multitask_inference

        def post_fused(lg, mk):
            o = fused_multitask_inference(
                lg, mk, thing_mask, object_mask_threshold=0.8,
                overlap_threshold=0.8, topk=150, phase_layout=True,
            )
            return (o["sem_seg_argmax"].astype(jnp.uint8),
                    o["panoptic_seg"].astype(jnp.uint8), o["scores"])

        timed("postprocess FUSED (production)", post_fused, logits, masks_small)

    # ---- cumulative compositions: localize WHERE the composed-graph
    # overhead appears (r5: seg_full nets ~131 ms vs ~114 stage-sum).
    # cum2 = backbone+pixel decoder in one graph; cum3 = + query decoder
    # (= model.apply); frame = + fused postprocess (= bench seg_step).
    if which & {"cum2", "all"}:
        def bb_pd(bv, pv, x):
            f = bb.apply(bv, x)
            mf, _, ms = pd.apply(pv, f)
            return mf, ms

        timed("cum2 backbone+pixel decoder", bb_pd, bb_params, pd_params, img)

    if which & {"cum3", "all"}:
        timed("cum3 model.apply (bb+pd+qdec)",
              lambda v, x, t: model.apply(v, x, t)["pred_masks"],
              variables, img, tasks)

    # cum3c: the same composition built manually from the stage modules
    # (sanity: must match cum3). cum3b: identical except an
    # optimization_barrier between the pixel-decoder outputs and the query
    # decoder — tests whether the ~+11 ms qdec-join overhead (cum3 - cum2 -
    # isolated qdec) is a cross-boundary fusion/layout pathology (barrier
    # recovers the isolated cost) or true scheduling loss (barrier doesn't).
    if which & {"cum3b", "cum3c"} & which or which & {"cum3b", "cum3c"}:
        from uni_encoder_tpu.models.transformer_decoder import (
            OneFormerQueryDecoder,
        )

        qd = OneFormerQueryDecoder()
        qv = {"params": params["predictor"]}
        task_emb = jnp.asarray(rng.randn(1, 256), jnp.bfloat16)

        def compose(bv, pv, qvv, te, x, barrier):
            f = bb.apply(bv, x)
            mf, _, ms = pd.apply(pv, f)
            if barrier:
                mf, ms, te = jax.lax.optimization_barrier((mf, ms, te))
            o = qd.apply(qvv, ms, mf, te)
            return o["pred_masks"]

        if "cum3c" in which:
            timed("cum3c manual bb+pd+qdec (no barrier)",
                  lambda bv, pv, qvv, te, x: compose(bv, pv, qvv, te, x, False),
                  bb_params, pd_params, qv, task_emb, img)
        if "cum3b" in which:
            timed("cum3b manual bb+pd+BARRIER+qdec",
                  lambda bv, pv, qvv, te, x: compose(bv, pv, qvv, te, x, True),
                  bb_params, pd_params, qv, task_emb, img)

    # ---- full bench step (seg fwd + fused postprocess), matching bench.py's
    # seg_step: measures the glue + cross-stage scheduling the isolated rows
    # miss (r5: stage sum ~124 ms vs 144.6 ms end-to-end)
    if which & {"frame", "all"}:
        from uni_encoder_tpu.data.tokenizer import tokenize_task as _tt
        from uni_encoder_tpu.inference.fused_postprocess import (
            fused_multitask_inference,
        )

        thing_mask = jnp.asarray(np.isin(np.arange(19), np.arange(11, 19)))

        def seg_full(v, im, tk):
            out = model.apply(v, im, tk)
            post = fused_multitask_inference(
                out["pred_logits"][0], out["pred_masks"][0], thing_mask,
                object_mask_threshold=0.8, overlap_threshold=0.8, topk=150,
            )
            return (post["sem_seg_argmax"].astype(jnp.uint8),
                    post["panoptic_seg"].astype(jnp.uint8), post["scores"])

        timed("seg_step FULL (fwd+fused post)", seg_full, variables, img, tasks)

    # ---- sequence pass
    if which & {"seq", "all"}:
        dep = jnp.asarray(rng.randn(1, 192, 512, 3), jnp.bfloat16)
        prev = jnp.asarray(rng.randn(1, 192, 512, 3), jnp.bfloat16)
        vs = jax.jit(
            lambda r, a, b: model.init(r, a, b, method=UniEncoder.forward_sequence)
        )(jax.random.PRNGKey(0), dep.astype(jnp.float32), prev.astype(jnp.float32))
        vs = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, vs
        )

        def seq(v, a, b):
            o = model.apply(v, a, b, method=UniEncoder.forward_sequence)
            return o["disp"], o["cam_T_cam"]

        timed("sequence pass 192x512", seq, vs, dep, prev)


if __name__ == "__main__":
    main()
