"""Backbone smoke tests + NATTEN-semantics unit test for neighborhood
attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu.models.backbones.convnext import ConvNeXt
from uni_encoder_tpu.models.backbones.dinat import DiNAT
from uni_encoder_tpu.models.backbones.resnet import ResNet
from uni_encoder_tpu.ops.neighborhood_attention import _axis_indices, neighborhood_attention_2d


@pytest.mark.parametrize(
    "bb,expect",
    [
        (ConvNeXt(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128)), {"res2": 16, "res3": 32, "res4": 64, "res5": 128}),
        (ResNet(depth=18), {"stem": 64, "res2": 64, "res3": 128, "res4": 256, "res5": 512}),
        (DiNAT(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), kernel_size=3,
               dilations=((1,), (2,), (1,), (1,))), {"res2": 16, "res3": 32, "res4": 64, "res5": 128}),
    ],
)
def test_backbone_shapes(bb, expect):
    x = jnp.zeros((1, 64, 96, 3))
    v = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(bb.apply)(v, x)
    strides = {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": 32}
    for k, c in expect.items():
        s = strides[k]
        assert out[k].shape == (1, 64 // s, 96 // s, c), (k, out[k].shape)
        assert not np.isnan(np.asarray(out[k])).any()


def _nat_reference(q, k, v, rpb, kernel, dilation):
    """Brute-force NATTEN semantics (clamped dilated windows)."""
    B, H, W, nh, dh = q.shape
    idx_h, rel_h = _axis_indices(H, kernel, dilation)
    idx_w, rel_w = _axis_indices(W, kernel, dilation)
    out = np.zeros_like(np.asarray(v))
    qn, kn, vn, rn = map(np.asarray, (q, k, v, rpb))
    for i in range(H):
        for j in range(W):
            keys, biases = [], []
            for a in range(kernel):
                for b in range(kernel):
                    keys.append((idx_h[i, a], idx_w[j, b]))
                    biases.append(rn[:, rel_h[i, a], rel_w[j, b]])  # (nh,)
            logits = np.stack(
                [np.einsum("bhd,bhd->bh", qn[:, i, j], kn[:, y, x]) for (y, x) in keys], -1
            )  # (B, nh, k*k)
            logits = logits + np.stack(biases, -1)[None]
            attn = np.exp(logits - logits.max(-1, keepdims=True))
            attn /= attn.sum(-1, keepdims=True)
            vals = np.stack([vn[:, y, x] for (y, x) in keys], -2)  # (B, nh, kk, dh)
            out[:, i, j] = np.einsum("bhk,bhkd->bhd", attn, vals)
    return out


@pytest.mark.parametrize("dilation", [1, 2])
def test_neighborhood_attention_matches_bruteforce(dilation):
    rng = np.random.RandomState(0)
    B, H, W, nh, dh, kernel = 1, 7, 9, 2, 4, 3
    q = jnp.asarray(rng.randn(B, H, W, nh, dh), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, W, nh, dh), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, W, nh, dh), jnp.float32)
    rpb = jnp.asarray(rng.randn(nh, 2 * kernel - 1, 2 * kernel - 1), jnp.float32)
    ours = np.asarray(neighborhood_attention_2d(q, k, v, rpb, kernel, dilation))
    ref = _nat_reference(q, k, v, rpb, kernel, dilation)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_drop_path_train_stochastic_eval_identity():
    """drop_path_rate must be a real knob (reference swin.py:148-152):
    stochastic across rngs in train mode, exact identity in eval mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uni_encoder_tpu.models.backbones.swin import SwinTransformer

    kw = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
              drop_path_rate=0.5)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)

    train_m = SwinTransformer(**kw, deterministic=False)
    variables = train_m.init(
        {"params": jax.random.PRNGKey(0), "drop_path": jax.random.PRNGKey(1)}, x
    )
    o1 = train_m.apply(variables, x, rngs={"drop_path": jax.random.PRNGKey(2)})
    o2 = train_m.apply(variables, x, rngs={"drop_path": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(o1["res5"]), np.asarray(o2["res5"]))

    eval_m = SwinTransformer(**kw, deterministic=True)
    zero_m = SwinTransformer(**{**kw, "drop_path_rate": 0.0}, deterministic=True)
    oe = eval_m.apply(variables, x)
    oz = zero_m.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(oe["res5"]), np.asarray(oz["res5"]))
