"""Checkpoint-conversion activation parity against torch.

Builds synthetic torch state dicts with the REFERENCE's exact key names
(naming scheme from /root/reference/model/modeling/backbone/swin.py and
pixel_decoder/msdeformattn.py), converts them with engine/checkpoint.py,
and asserts that our flax modules produce the same activations as an
independent torch implementation of the published semantics (for the
deformable layer, the reference's own ms_deform_attn_core_pytorch spec is
used as the sampling oracle). This is the real contract a converted d2
checkpoint must satisfy.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu.engine import checkpoint as ckpt

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

REF_CORE = "/root/reference/model/modeling/pixel_decoder/ops/functions/ms_deform_attn_func.py"


def _sd_tensor(rng, *shape):
    return torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.1)


# ------------------------------------------------------------------- Swin
def _torch_swin_block(sd, pre, x, window, heads, shift):
    """Independent torch implementation of the published Swin block
    (W-MSA/SW-MSA + MLP), consuming reference-named weights."""
    from uni_encoder_tpu.models.backbones.swin import (
        _relative_position_index,
        _shift_attn_mask,
    )

    B, H, W, C = x.shape
    N = window * window
    Dh = C // heads
    shortcut = x
    h = F.layer_norm(x, (C,), sd[pre + "norm1.weight"], sd[pre + "norm1.bias"], eps=1e-5)
    if shift > 0:
        h = torch.roll(h, shifts=(-shift, -shift), dims=(1, 2))
    hw = (
        h.view(B, H // window, window, W // window, window, C)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(-1, N, C)
    )
    qkv = F.linear(hw, sd[pre + "attn.qkv.weight"], sd[pre + "attn.qkv.bias"])
    qkv = qkv.reshape(-1, N, 3, heads, Dh).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * Dh ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    idx = _relative_position_index(window, window).reshape(-1)
    rel = sd[pre + "attn.relative_position_bias_table"][idx].reshape(N, N, heads)
    attn = attn + rel.permute(2, 0, 1)[None]
    if shift > 0:
        mask = torch.from_numpy(np.asarray(_shift_attn_mask(H, W, window, shift)))
        nW = mask.shape[0]
        attn = attn.view(-1, nW, heads, N, N) + mask[None, :, None]
        attn = attn.view(-1, heads, N, N)
    attn = attn.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(-1, N, C)
    out = F.linear(out, sd[pre + "attn.proj.weight"], sd[pre + "attn.proj.bias"])
    out = (
        out.view(B, H // window, W // window, window, window, C)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(B, H, W, C)
    )
    if shift > 0:
        out = torch.roll(out, shifts=(shift, shift), dims=(1, 2))
    x = shortcut + out
    y = F.layer_norm(x, (C,), sd[pre + "norm2.weight"], sd[pre + "norm2.bias"], eps=1e-5)
    y = F.linear(y, sd[pre + "mlp.fc1.weight"], sd[pre + "mlp.fc1.bias"])
    y = F.gelu(y)
    y = F.linear(y, sd[pre + "mlp.fc2.weight"], sd[pre + "mlp.fc2.bias"])
    return x + y


@pytest.mark.parametrize("shift", [0, 3])
def test_swin_block_conversion_activation_parity(shift):
    from uni_encoder_tpu.models.backbones.swin import SwinBlock

    rng = np.random.RandomState(0)
    B, H, W, C, heads, window = 2, 14, 14, 32, 4, 7
    pre = "backbone.layers.0.blocks.0."
    sd = {
        pre + "norm1.weight": _sd_tensor(rng, C) + 1,
        pre + "norm1.bias": _sd_tensor(rng, C),
        pre + "attn.qkv.weight": _sd_tensor(rng, 3 * C, C),
        pre + "attn.qkv.bias": _sd_tensor(rng, 3 * C),
        pre + "attn.proj.weight": _sd_tensor(rng, C, C),
        pre + "attn.proj.bias": _sd_tensor(rng, C),
        pre + "attn.relative_position_bias_table": _sd_tensor(rng, (2 * window - 1) ** 2, heads),
        pre + "norm2.weight": _sd_tensor(rng, C) + 1,
        pre + "norm2.bias": _sd_tensor(rng, C),
        pre + "mlp.fc1.weight": _sd_tensor(rng, 4 * C, C),
        pre + "mlp.fc1.bias": _sd_tensor(rng, 4 * C),
        pre + "mlp.fc2.weight": _sd_tensor(rng, C, 4 * C),
        pre + "mlp.fc2.bias": _sd_tensor(rng, C),
    }
    x = rng.randn(B, H, W, C).astype(np.float32)

    golden = _torch_swin_block(
        {k: v for k, v in sd.items()}, pre, torch.from_numpy(x), window, heads, shift
    ).numpy()

    state = {k: v.numpy() for k, v in sd.items()}
    c = ckpt.Converter(state)
    ckpt.convert_swin(c, depths=(1,))
    params = c.params["backbone"]["layers_0_blocks_0"]

    block = SwinBlock(dim=C, num_heads=heads, window=window, shift=shift)
    ours = block.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-5, rtol=2e-5)


# ------------------------------------------------- deformable encoder layer
def _load_reference_core():
    if not os.path.exists(REF_CORE):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("ref_msda", REF_CORE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.ms_deform_attn_core_pytorch


def _torch_deform_layer(sd, pre, src, pos, ref_pts, shapes, heads, points):
    """Reference MSDeformAttnTransformerEncoderLayer semantics
    (msdeformattn.py:27-149 + ops/modules/ms_deform_attn.py:79-126), with
    the reference's own torch sampling spec as the core."""
    core = _load_reference_core()
    B, N, C = src.shape
    M, L, P = heads, len(shapes), points
    D = C // M
    q = src + pos
    value = F.linear(src, sd[pre + "self_attn.value_proj.weight"], sd[pre + "self_attn.value_proj.bias"])
    offsets = F.linear(q, sd[pre + "self_attn.sampling_offsets.weight"], sd[pre + "self_attn.sampling_offsets.bias"])
    offsets = offsets.view(B, N, M, L, P, 2)
    w = F.linear(q, sd[pre + "self_attn.attention_weights.weight"], sd[pre + "self_attn.attention_weights.bias"])
    w = w.view(B, N, M, L * P).softmax(-1).view(B, N, M, L, P)
    normalizer = torch.tensor([[wd, ht] for (ht, wd) in shapes], dtype=torch.float32)
    loc = ref_pts[None, :, None, None, None, :] + offsets / normalizer[None, None, None, :, None, :]
    sampled = core(value.view(B, N, M, D), torch.as_tensor(shapes), loc, w)
    src2 = F.linear(sampled, sd[pre + "self_attn.output_proj.weight"], sd[pre + "self_attn.output_proj.bias"])
    src = src + src2
    src = F.layer_norm(src, (C,), sd[pre + "norm1.weight"], sd[pre + "norm1.bias"], eps=1e-5)
    src2 = F.linear(src, sd[pre + "linear1.weight"], sd[pre + "linear1.bias"]).relu()
    src2 = F.linear(src2, sd[pre + "linear2.weight"], sd[pre + "linear2.bias"])
    src = src + src2
    return F.layer_norm(src, (C,), sd[pre + "norm2.weight"], sd[pre + "norm2.bias"], eps=1e-5)


def test_deformable_encoder_layer_conversion_activation_parity():
    from uni_encoder_tpu.models.pixel_decoders.msdeformattn import (
        MSDeformAttnEncoderLayer,
        _reference_points,
    )

    rng = np.random.RandomState(1)
    shapes = ((8, 8), (4, 4), (2, 2))
    B, C, M, P, FFN = 2, 32, 4, 4, 64
    N = sum(h * w for h, w in shapes)
    pre = "sem_seg_head.pixel_decoder.transformer.encoder.layers.0."
    L = len(shapes)
    sd = {
        pre + "self_attn.value_proj.weight": _sd_tensor(rng, C, C),
        pre + "self_attn.value_proj.bias": _sd_tensor(rng, C),
        pre + "self_attn.sampling_offsets.weight": _sd_tensor(rng, M * L * P * 2, C),
        pre + "self_attn.sampling_offsets.bias": _sd_tensor(rng, M * L * P * 2),
        pre + "self_attn.attention_weights.weight": _sd_tensor(rng, M * L * P, C),
        pre + "self_attn.attention_weights.bias": _sd_tensor(rng, M * L * P),
        pre + "self_attn.output_proj.weight": _sd_tensor(rng, C, C),
        pre + "self_attn.output_proj.bias": _sd_tensor(rng, C),
        pre + "norm1.weight": _sd_tensor(rng, C) + 1,
        pre + "norm1.bias": _sd_tensor(rng, C),
        pre + "norm2.weight": _sd_tensor(rng, C) + 1,
        pre + "norm2.bias": _sd_tensor(rng, C),
        pre + "linear1.weight": _sd_tensor(rng, FFN, C),
        pre + "linear1.bias": _sd_tensor(rng, FFN),
        pre + "linear2.weight": _sd_tensor(rng, C, FFN),
        pre + "linear2.bias": _sd_tensor(rng, C),
    }
    src = rng.randn(B, N, C).astype(np.float32)
    pos = rng.randn(1, N, C).astype(np.float32)
    ref = np.asarray(_reference_points(shapes))  # (N, 2)

    golden = _torch_deform_layer(
        sd, pre, torch.from_numpy(src), torch.from_numpy(pos),
        torch.from_numpy(ref), shapes, M, P,
    ).numpy()

    state = {k: v.numpy() for k, v in sd.items()}
    c = ckpt.Converter(state)
    ckpt.convert_msdeform_pixel_decoder(c, layers=1, levels=len(shapes))
    params = c.params["pixel_decoder"]["trunk"]["encoder_layer_0"]

    layer = MSDeformAttnEncoderLayer(d_model=C, d_ffn=FFN, n_levels=len(shapes), n_heads=M, n_points=P)
    ours = layer.apply(
        {"params": params},
        jnp.asarray(src), jnp.asarray(pos), jnp.asarray(ref), shapes,
    )
    np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-5, rtol=2e-5)
