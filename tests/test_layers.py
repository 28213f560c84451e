"""Torch-parity of the core flax building blocks."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uni_encoder_tpu.models.layers import MLP, FrozenBatchNorm, MultiheadAttention  # noqa: E402


def test_multihead_attention_matches_torch():
    E, H, B, Lq, Lk = 32, 4, 2, 5, 7
    rng = np.random.RandomState(0)
    q = rng.randn(B, Lq, E).astype(np.float32)
    k = rng.randn(B, Lk, E).astype(np.float32)
    v = rng.randn(B, Lk, E).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(E, H, batch_first=True)
    tmha.eval()
    with torch.no_grad():
        ref, _ = tmha(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    ref = ref.numpy()

    params = {
        "params": {
            "in_proj": tmha.in_proj_weight.detach().numpy().T,
            "in_proj_bias": tmha.in_proj_bias.detach().numpy(),
            "out_proj_kernel": tmha.out_proj.weight.detach().numpy().T,
            "out_proj_bias": tmha.out_proj.bias.detach().numpy(),
        }
    }
    ours = MultiheadAttention(E, H).apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_multihead_attention_bool_mask():
    E, H, B, Lq, Lk = 16, 2, 1, 3, 6
    rng = np.random.RandomState(1)
    q = rng.randn(B, Lq, E).astype(np.float32)
    kv = rng.randn(B, Lk, E).astype(np.float32)
    mask = rng.rand(B * H, Lq, Lk) > 0.6  # True = not allowed

    tmha = torch.nn.MultiheadAttention(E, H, batch_first=True)
    tmha.eval()
    with torch.no_grad():
        ref, _ = tmha(
            torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv),
            attn_mask=torch.from_numpy(mask),
        )
    ref = ref.numpy()

    params = {
        "params": {
            "in_proj": tmha.in_proj_weight.detach().numpy().T,
            "in_proj_bias": tmha.in_proj_bias.detach().numpy(),
            "out_proj_kernel": tmha.out_proj.weight.detach().numpy().T,
            "out_proj_bias": tmha.out_proj.bias.detach().numpy(),
        }
    }
    jmask = jnp.asarray(mask.reshape(B, H, Lq, Lk))
    ours = MultiheadAttention(E, H).apply(params, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), attn_mask=jmask)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_mlp_matches_torch_semantics():
    # 2-layer MLP: relu after first layer, linear second
    rng = np.random.RandomState(2)
    x = rng.randn(3, 77).astype(np.float32)
    w0 = rng.randn(77, 64).astype(np.float32) * 0.1
    b0 = rng.randn(64).astype(np.float32)
    w1 = rng.randn(64, 64).astype(np.float32) * 0.1
    b1 = rng.randn(64).astype(np.float32)
    params = {
        "params": {
            "layers_0": {"kernel": w0, "bias": b0},
            "layers_1": {"kernel": w1, "bias": b1},
        }
    }
    ours = MLP(64, 64, 2).apply(params, jnp.asarray(x))
    ref = np.maximum(x @ w0 + b0, 0) @ w1 + b1
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_frozen_batchnorm_matches_torch_eval():
    C = 8
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 4, C).astype(np.float32)
    bn = torch.nn.BatchNorm2d(C)
    bn.eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.rand(C).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.randn(C).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(C).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.rand(C).astype(np.float32) + 0.5))
        ref = bn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    variables = {
        "params": {"scale": bn.weight.detach().numpy(), "bias": bn.bias.detach().numpy()},
        "batch_stats": {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()},
    }
    ours = FrozenBatchNorm(C).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)
