"""ModelConfig.num_depth_scales: the sequence path and monodepth loss run the
identical structure over a reduced disparity pyramid (the multichip dryrun's
micro config uses 2 scales; production stays at the reference's 4,
monodepth_loss.py num_scales)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu import config as C
from uni_encoder_tpu.models.oneformer import UniEncoder
from uni_encoder_tpu.training.monodepth import COEFS, monodepth_loss


def _model_cfg(n_scales):
    swin = C.SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8))
    of = C.OneFormerConfig(
        num_object_queries=8, dec_layers=2, class_dec_layers=1,
        dim_feedforward=64, hidden_dim=32, nheads=4,
    )
    head = C.SemSegHeadConfig(num_classes=19, convs_dim=32, mask_dim=32,
                              transformer_enc_layers=1)
    return C.ModelConfig(
        backbone=C.BackboneConfig(name="swin", swin=swin),
        sem_seg_head=head, one_former=of, is_train=True,
        num_depth_scales=n_scales,
    )


def test_sequence_train_emits_reduced_pyramid():
    """forward_sequence_train with num_depth_scales=2 emits exactly scales
    {0, 1} for disps/flow/mask/prob (checked via eval_shape — no compile)."""
    model = UniEncoder(_model_cfg(2))
    B, H, W = 1, 32, 32
    img = jnp.zeros((B, H, W, 3))

    def fwd(rng):
        return model.init(
            {"params": rng, "drop_path": rng}, img, img, img,
            method=UniEncoder.forward_sequence_train,
        )

    variables = jax.eval_shape(fwd, jax.random.PRNGKey(0))
    out_shapes = jax.eval_shape(
        lambda v: model.apply(
            v, img, img, img, method=UniEncoder.forward_sequence_train,
            mutable=["batch_stats"], rngs={"drop_path": jax.random.PRNGKey(0)},
        ),
        variables,
    )[0]
    assert sorted(out_shapes["disps"]) == [0, 1]
    for key in ("complete_flow", "motion_mask", "motion_prob"):
        assert sorted(out_shapes[key]) == [(-1, 0), (-1, 1), (1, 0), (1, 1)], key
    # param tree has no heads for the dropped scales
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = {"/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat}
    assert not any("output_conv3" in n or "output_conv4" in n for n in names)


@pytest.mark.parametrize("S", [2, 4])
def test_monodepth_loss_reduced_scales_finite(S):
    """The 7-term loss runs unchanged over S scales; at S=4 the /S divisor
    equals the reference's /num_scales."""
    rng = np.random.RandomState(0)
    B, H, W = 1, 32, 32
    frame_ids = (-1, 1)
    outputs = {
        "disps": {
            s: jnp.asarray(rng.rand(B, H // (2 ** s), W // (2 ** s), 1), jnp.float32)
            for s in range(S)
        },
        "cam_T_cam": {},
        "complete_flow": {},
        "motion_mask": {},
        "motion_prob": {},
    }
    for f in frame_ids:
        T = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
        T[:, 0, 3] = 0.01 * f
        outputs["cam_T_cam"][f] = jnp.asarray(T)
        for s in range(S):
            h, w = H // (2 ** s), W // (2 ** s)
            outputs["complete_flow"][(f, s)] = jnp.asarray(
                rng.randn(B, h, w, 3) * 0.01, jnp.float32)
            logits = jnp.asarray(rng.randn(B, h, w, 1) * 0.005, jnp.float32)
            outputs["motion_prob"][(f, s)] = logits
            outputs["motion_mask"][(f, s)] = jax.nn.sigmoid(logits)
    K = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
    K[:, 0, 0] = K[:, 1, 1] = 25.0
    K[:, 0, 2], K[:, 1, 2] = W / 2, H / 2
    targets = {
        "color": {f: jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
                  for f in (0, -1, 1)},
        "K": jnp.asarray(K),
        "inv_K": jnp.asarray(np.linalg.inv(K)),
    }
    out = jax.jit(
        lambda r, o, t: monodepth_loss(r, o, t, jnp.asarray(40000, jnp.int32))
    )(jax.random.PRNGKey(0), outputs, targets)
    assert np.isfinite(float(out["loss_monodepth"]))
    for k in COEFS:
        assert np.isfinite(float(out[f"monodepth/{k}"])), k
