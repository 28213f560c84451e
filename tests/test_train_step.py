"""End-to-end training step on an ultra-tiny config (single CPU device).

The multi-device sharded version of this path is exercised by
__graft_entry__.dryrun_multichip; this test guards the training stack
(criterion + monodepth loss + optimizer) in the regular suite.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu import config as C
from uni_encoder_tpu.training.train_step import Trainer


def _micro_config():
    swin = C.SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8))
    of = C.OneFormerConfig(
        num_object_queries=8, dec_layers=2, class_dec_layers=1,
        dim_feedforward=64, hidden_dim=32, nheads=4, train_num_points=32,
        oversample_ratio=2.0,
    )
    head = C.SemSegHeadConfig(num_classes=19, convs_dim=32, mask_dim=32, transformer_enc_layers=1)
    te = C.TextEncoderConfig(width=32, num_layers=1, vocab_size=512, context_length=16)
    model = C.ModelConfig(
        backbone=C.BackboneConfig(name="swin", swin=swin),
        sem_seg_head=head, one_former=of, text_encoder=te, is_train=True,
    )
    return C.Config(model=model, input=C.InputConfig(task_seq_len=16, max_seq_len=16))


@pytest.fixture(scope="module")
def batches():
    rng = np.random.RandomState(0)
    B, H, W, N = 2, 32, 32, 2
    seg = {
        "images": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "task_tokens": jnp.ones((B, 16), jnp.int32),
        "text_tokens": jnp.ones((B, 16), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 19, (B, N)), jnp.int32),
        "masks": jnp.asarray(rng.rand(B, N, H // 4, W // 4) > 0.5),
        "valid": jnp.ones((B, N), bool),
    }
    K = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    K[:, 0, 0] = K[:, 1, 1] = 25.0
    K[:, 0, 2], K[:, 1, 2] = W / 2, H / 2
    seq = {
        "images": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32) * 0.1,
        "prev_images": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32) * 0.1,
        "next_images": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32) * 0.1,
        "K": jnp.asarray(K),
        "inv_K": jnp.asarray(np.linalg.inv(K)),
    }
    return seg, seq


def test_train_step_decreases_nothing_nan(batches):
    seg, seq = batches
    trainer = Trainer(_micro_config())
    state = trainer.init(jax.random.PRNGKey(0), seg, seq)
    step = jax.jit(trainer.train_step)
    state, m1 = step(state, seg, seq, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"])), m1
    state, m2 = step(state, seg, seq, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))
    assert int(state.step) == 2
    # params actually moved
    p0 = trainer.init(jax.random.PRNGKey(0), seg, seq).params
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(state.params))
    )
    assert moved
