"""End-to-end shape/jit smoke tests for the full meta-architecture on tiny
static inputs (CPU).

Uses a structurally-production config (Swin + MSDeformAttnPixelDecoder +
TransDSSL + query decoder + pose/motion stack — every production component)
with scaled-down widths so the XLA CPU compile stays in seconds; the
production-width compile is exercised on real hardware by bench.py and by
the driver's entry() compile check.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu import config as C
from uni_encoder_tpu.config import Config
from uni_encoder_tpu.models.oneformer import UniEncoder


def _scaled_config():
    swin = C.SwinConfig(embed_dim=32, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8))
    of = C.OneFormerConfig(
        num_object_queries=20, dec_layers=4, class_dec_layers=1,
        dim_feedforward=128, hidden_dim=64, nheads=4,
    )
    head = C.SemSegHeadConfig(num_classes=19, convs_dim=64, mask_dim=64,
                              transformer_enc_layers=2)
    return dataclasses.replace(
        Config().model,
        backbone=C.BackboneConfig(name="swin", swin=swin),
        sem_seg_head=head,
        one_former=of,
    )


@pytest.fixture(scope="module")
def tiny_model():
    cfg = _scaled_config()
    model = UniEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((1, 64, 128, 3), jnp.float32)
    tasks = jnp.zeros((1, 77), jnp.int32)
    variables = jax.jit(model.init)(rng, images, tasks)
    return cfg, model, variables


def test_segmentation_forward(tiny_model):
    cfg, model, variables = tiny_model
    images = jnp.asarray(np.random.RandomState(0).randn(1, 64, 128, 3), jnp.float32)
    tasks = jnp.ones((1, 77), jnp.int32)
    out = jax.jit(model.apply)(variables, images, tasks)
    Q = cfg.one_former.num_object_queries
    K = cfg.sem_seg_head.num_classes
    assert out["pred_logits"].shape == (1, Q, K + 1)
    assert out["pred_masks"].shape == (1, Q, 16, 32)  # stride 4
    assert not np.isnan(np.asarray(out["pred_logits"])).any()
    assert not np.isnan(np.asarray(out["pred_masks"])).any()


def test_sequence_forward(tiny_model):
    cfg, model, variables = tiny_model
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 64, 128, 3), jnp.float32)
    prev = jnp.asarray(rng.randn(1, 64, 128, 3), jnp.float32)
    # sequence path has extra params (pose/motion/depth decoders): init on it
    model2 = UniEncoder(cfg)
    variables2 = jax.jit(
        lambda r, a, b: model2.init(r, a, b, method=UniEncoder.forward_sequence)
    )(jax.random.PRNGKey(0), img, prev)
    out = jax.jit(
        lambda v, a, b: model2.apply(v, a, b, method=UniEncoder.forward_sequence)
    )(variables2, img, prev)
    assert out["disp"].shape == (1, 64, 128, 1)
    assert out["cam_T_cam"].shape == (1, 4, 4)
    assert out["complete_flow"].shape == (1, 64, 128, 3)
    assert out["motion_mask"].shape == (1, 64, 128, 1)
    d = np.asarray(out["disp"])
    assert (d >= 0).all() and (d <= 1).all()
    assert not np.isnan(np.asarray(out["cam_T_cam"])).any()


@pytest.mark.slow
def test_production_width_forward_compiles():
    """Full production-width compile check (minutes on CPU; run with
    --runslow or on real hardware)."""
    cfg = Config().model
    model = UniEncoder(cfg)
    images = jnp.zeros((1, 64, 128, 3), jnp.float32)
    tasks = jnp.zeros((1, 77), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, tasks)
    out = jax.jit(model.apply)(variables, images, tasks)
    assert out["pred_masks"].shape[-2:] == (16, 32)


def test_motion_decoder_v1_shapes():
    """MotionDecoderV1 (reference dynamo_motion_decoder.py:1-93): pyramid
    refinement over the pose-encoder features, 0.01 output scale."""
    from uni_encoder_tpu.models.motion_decoder import MotionDecoderV1

    rng = np.random.RandomState(0)
    H, W = 32, 64
    pyr = {
        "full_res_input": jnp.asarray(rng.randn(1, H, W, 8), jnp.float32),
        "stem": jnp.asarray(rng.randn(1, H // 2, W // 2, 64), jnp.float32),
        "res2": jnp.asarray(rng.randn(1, H // 4, W // 4, 64), jnp.float32),
        "res3": jnp.asarray(rng.randn(1, H // 8, W // 8, 128), jnp.float32),
        "res4": jnp.asarray(rng.randn(1, H // 16, W // 16, 256), jnp.float32),
        "res5": jnp.asarray(rng.randn(1, H // 32, W // 32, 512), jnp.float32),
    }
    ego = jnp.asarray(rng.randn(1, 1, 1, 6) * 0.01, jnp.float32)

    for out_dim, keys in ((3, ("complete_flow",)), (1, ("motion_prob", "motion_mask"))):
        m = MotionDecoderV1(out_dim=out_dim)
        v = m.init(jax.random.PRNGKey(0), pyr, ego)
        out = jax.jit(lambda v, p, e: m.apply(v, p, e))(v, pyr, ego)
        # scale s counts from full resolution
        for s, hw in enumerate(((H, W), (H // 2, W // 2), (H // 4, W // 4), (H // 8, W // 8))):
            for k in keys:
                assert out[(k, s)].shape == (1, hw[0], hw[1], out_dim)
        if out_dim == 1:
            mm = np.asarray(out[("motion_mask", 0)])
            assert (mm >= 0).all() and (mm <= 1).all()
