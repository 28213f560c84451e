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


# ------------------------------------------------------------------ ConvNeXt
def test_convnext_block_conversion_activation_parity():
    """Converted reference-named ConvNeXt weights -> same activations as an
    independent torch restatement of the published block semantics
    (reference convnext.py:15-55: dw7x7 -> LN -> 4x MLP -> gamma -> res)."""
    from uni_encoder_tpu.models.backbones.convnext import ConvNeXtBlock

    rng = np.random.RandomState(0)
    C = 16
    pre = "backbone.stages.0.0."
    sd = {
        pre + "dwconv.weight": _sd_tensor(rng, C, 1, 7, 7),
        pre + "dwconv.bias": _sd_tensor(rng, C),
        pre + "norm.weight": 1 + 0.1 * _sd_tensor(rng, C),
        pre + "norm.bias": _sd_tensor(rng, C),
        pre + "pwconv1.weight": _sd_tensor(rng, 4 * C, C),
        pre + "pwconv1.bias": _sd_tensor(rng, 4 * C),
        pre + "pwconv2.weight": _sd_tensor(rng, C, 4 * C),
        pre + "pwconv2.bias": _sd_tensor(rng, C),
        pre + "gamma": _sd_tensor(rng, C),
    }
    x = torch.from_numpy(rng.randn(1, 10, 12, C).astype(np.float32))

    # torch oracle (NHWC input)
    h = F.conv2d(
        x.permute(0, 3, 1, 2), sd[pre + "dwconv.weight"], sd[pre + "dwconv.bias"],
        padding=3, groups=C,
    ).permute(0, 2, 3, 1)
    h = F.layer_norm(h, (C,), sd[pre + "norm.weight"], sd[pre + "norm.bias"], eps=1e-6)
    h = F.linear(h, sd[pre + "pwconv1.weight"], sd[pre + "pwconv1.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd[pre + "pwconv2.weight"], sd[pre + "pwconv2.bias"])
    want = (x + sd[pre + "gamma"] * h).numpy()

    state = {k: v.numpy() for k, v in sd.items()}
    c = ckpt.Converter(state)
    ckpt.convert_convnext(c, depths=(1,))
    params = c.params["backbone"]["stages_0_blocks_0"]

    blk = ConvNeXtBlock(C)
    got = np.asarray(blk.apply({"params": params}, jnp.asarray(np.asarray(x))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ------------------------------------------------------------------ ResNet
def test_resnet_stage_conversion_activation_parity():
    """Converted d2-ResNet BasicBlock weights (conv+frozen BN running stats,
    reference resnet.py) -> same activations as a torch restatement."""
    from uni_encoder_tpu.models.backbones.resnet import BasicBlock

    rng = np.random.RandomState(1)
    Cin, Cout = 8, 16
    pre = "backbone.res3.0."
    sd = {}

    def bn_keys(name, ch):
        sd[name + ".weight"] = 1 + 0.1 * _sd_tensor(rng, ch)
        sd[name + ".bias"] = _sd_tensor(rng, ch)
        sd[name + ".running_mean"] = _sd_tensor(rng, ch)
        sd[name + ".running_var"] = torch.abs(1 + 0.1 * _sd_tensor(rng, ch))

    sd[pre + "conv1.weight"] = _sd_tensor(rng, Cout, Cin, 3, 3)
    bn_keys(pre + "conv1.norm", Cout)
    sd[pre + "conv2.weight"] = _sd_tensor(rng, Cout, Cout, 3, 3)
    bn_keys(pre + "conv2.norm", Cout)
    sd[pre + "shortcut.weight"] = _sd_tensor(rng, Cout, Cin, 1, 1)
    bn_keys(pre + "shortcut.norm", Cout)

    x = torch.from_numpy(rng.randn(1, 9, 11, Cin).astype(np.float32))

    def t_bn(h, name):
        return F.batch_norm(
            h, sd[name + ".running_mean"], sd[name + ".running_var"],
            sd[name + ".weight"], sd[name + ".bias"], training=False, eps=1e-5,
        )

    hx = x.permute(0, 3, 1, 2)
    h = F.conv2d(hx, sd[pre + "conv1.weight"], stride=2, padding=1)
    h = F.relu(t_bn(h, pre + "conv1.norm"))
    h = F.conv2d(h, sd[pre + "conv2.weight"], padding=1)
    h = t_bn(h, pre + "conv2.norm")
    s = t_bn(F.conv2d(hx, sd[pre + "shortcut.weight"], stride=2), pre + "shortcut.norm")
    want = F.relu(h + s).permute(0, 2, 3, 1).numpy()

    state = {k: v.numpy() for k, v in sd.items()}
    c = ckpt.Converter(state)
    ckpt.convert_resnet(c, depths=(0, 1, 0, 0))
    params = c.params["backbone"]["res3_block0"]
    bstats = c.batch_stats["backbone"]["res3_block0"]

    blk = BasicBlock(Cout, stride=2)
    got = np.asarray(
        blk.apply({"params": params, "batch_stats": bstats}, jnp.asarray(np.asarray(x)))
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ------------------------------------------------------------------ DiNAT
def test_dinat_block_conversion_activation_parity():
    """Converted reference-named DiNAT weights -> same activations as the
    brute-force neighborhood-attention oracle + torch LN/MLP restatement
    (reference dinat.py:67-105, natten NeighborhoodAttention semantics)."""
    from uni_encoder_tpu.models.backbones.dinat import NATLayer
    from tests.test_backbones import _nat_reference

    rng = np.random.RandomState(2)
    C, heads, kernel, dil = 8, 2, 3, 2
    pre = "backbone.levels.0.blocks.0."
    sd = {
        pre + "norm1.weight": 1 + 0.1 * _sd_tensor(rng, C),
        pre + "norm1.bias": _sd_tensor(rng, C),
        pre + "attn.qkv.weight": _sd_tensor(rng, 3 * C, C),
        pre + "attn.qkv.bias": _sd_tensor(rng, 3 * C),
        pre + "attn.rpb": _sd_tensor(rng, heads, 2 * kernel - 1, 2 * kernel - 1),
        pre + "attn.proj.weight": _sd_tensor(rng, C, C),
        pre + "attn.proj.bias": _sd_tensor(rng, C),
        pre + "norm2.weight": 1 + 0.1 * _sd_tensor(rng, C),
        pre + "norm2.bias": _sd_tensor(rng, C),
        pre + "mlp.fc1.weight": _sd_tensor(rng, 4 * C, C),
        pre + "mlp.fc1.bias": _sd_tensor(rng, 4 * C),
        pre + "mlp.fc2.weight": _sd_tensor(rng, C, 4 * C),
        pre + "mlp.fc2.bias": _sd_tensor(rng, C),
    }
    x = torch.from_numpy(rng.randn(1, 7, 9, C).astype(np.float32))

    h = F.layer_norm(x, (C,), sd[pre + "norm1.weight"], sd[pre + "norm1.bias"], eps=1e-5)
    qkv = F.linear(h, sd[pre + "attn.qkv.weight"], sd[pre + "attn.qkv.bias"])
    qkv = qkv.reshape(1, 7, 9, 3, heads, C // heads)
    dh = C // heads
    q = (qkv[..., 0, :, :] * dh ** -0.5).numpy()
    k = qkv[..., 1, :, :].numpy()
    v = qkv[..., 2, :, :].numpy()
    attn_out = _nat_reference(q, k, v, sd[pre + "attn.rpb"].numpy(), kernel, dil)
    attn_out = torch.from_numpy(attn_out.reshape(1, 7, 9, C))
    h = F.linear(attn_out, sd[pre + "attn.proj.weight"], sd[pre + "attn.proj.bias"])
    x2 = x + h
    h = F.layer_norm(x2, (C,), sd[pre + "norm2.weight"], sd[pre + "norm2.bias"], eps=1e-5)
    h = F.linear(h, sd[pre + "mlp.fc1.weight"], sd[pre + "mlp.fc1.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd[pre + "mlp.fc2.weight"], sd[pre + "mlp.fc2.bias"])
    want = (x2 + h).numpy()

    state = {kk: vv.numpy() for kk, vv in sd.items()}
    c = ckpt.Converter(state)
    ckpt.convert_dinat(c, depths=(1,))
    params = c.params["backbone"]["levels_0_blocks_0"]

    layer = NATLayer(dim=C, num_heads=heads, kernel_size=kernel, dilation=dil, mlp_ratio=4.0)
    got = np.asarray(layer.apply({"params": params}, jnp.asarray(np.asarray(x))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ------------------------------------------------------------------ TransDSSL
def test_transdssl_fusion_block_conversion_activation_parity():
    """Converted refinenet weights -> torch restatement of the attention-gated
    FeatureFusionBlock (reference transdssl.py:222-306): res=x0+x1,
    att=softmax_c(1x1(RCU1(x1))), RCU2(res*att)+res, 2x align_corners=True
    upsample, 1x1 out conv."""
    from uni_encoder_tpu.models.pixel_decoders.transdssl import FeatureFusionBlock

    rng = np.random.RandomState(3)
    Cf = 8
    pre = "sem_seg_head.depth_decoder.layers.refinenet3."
    sd = {}
    for unit in ("resConfUnit1", "resConfUnit2"):
        for cv in ("conv1", "conv2"):
            sd[pre + f"{unit}.{cv}.weight"] = _sd_tensor(rng, Cf, Cf, 3, 3)
            sd[pre + f"{unit}.{cv}.bias"] = _sd_tensor(rng, Cf)
    sd[pre + "en_atten.weight"] = _sd_tensor(rng, Cf, Cf, 1, 1)
    sd[pre + "en_atten.bias"] = _sd_tensor(rng, Cf)
    sd[pre + "out_conv.weight"] = _sd_tensor(rng, Cf, Cf, 1, 1)
    sd[pre + "out_conv.bias"] = _sd_tensor(rng, Cf)

    x0 = torch.from_numpy(rng.randn(1, 6, 8, Cf).astype(np.float32))
    x1 = torch.from_numpy(rng.randn(1, 6, 8, Cf).astype(np.float32))

    def rcu(h, unit):
        r = F.relu(h)
        r = F.conv2d(r, sd[pre + f"{unit}.conv1.weight"], sd[pre + f"{unit}.conv1.bias"], padding=1)
        r = F.relu(r)
        r = F.conv2d(r, sd[pre + f"{unit}.conv2.weight"], sd[pre + f"{unit}.conv2.bias"], padding=1)
        return r + h

    a0, a1 = x0.permute(0, 3, 1, 2), x1.permute(0, 3, 1, 2)
    res = a0 + a1
    r1 = rcu(a1, "resConfUnit1")
    att = torch.softmax(F.conv2d(r1, sd[pre + "en_atten.weight"], sd[pre + "en_atten.bias"]), dim=1)
    out = rcu(res * att, "resConfUnit2") + res
    out = F.interpolate(out, scale_factor=2, mode="bilinear", align_corners=True)
    out = F.conv2d(out, sd[pre + "out_conv.weight"], sd[pre + "out_conv.bias"])
    want = out.permute(0, 2, 3, 1).numpy()

    state = {k: v.numpy() for k, v in sd.items()}
    c = ckpt.Converter(state)
    ckpt.convert_transdssl(c)
    params = c.params["depth_decoder"]["refinenet3"]

    blk = FeatureFusionBlock(Cf)
    got = np.asarray(blk.apply({"params": params}, jnp.asarray(np.asarray(x0)), jnp.asarray(np.asarray(x1))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ------------------------------------------------------------- pose decoder
def test_pose_decoder_conversion_activation_parity():
    """Full converted pose decoder vs torch restatement (reference
    resnet_like_pose_decoder.py:30-73): 4 fusion stages (1x1 proj + 2
    BN-residual blocks), squeeze + 3 pose convs, global mean, 0.01 scale."""
    from uni_encoder_tpu.models.pose_decoder import ResNetLikePoseDecoder

    rng = np.random.RandomState(4)
    # tiny two-frame channels (concat of two 8-ch frames = 16 etc.)
    feats_np = {
        "res2": rng.randn(1, 16, 32, 16).astype(np.float32),
        "res3": rng.randn(1, 8, 16, 32).astype(np.float32),
        "res4": rng.randn(1, 4, 8, 64).astype(np.float32),
        "res5": rng.randn(1, 2, 4, 128).astype(np.float32),
    }
    model = ResNetLikePoseDecoder()
    feats = {k: jnp.asarray(v) for k, v in feats_np.items()}
    tree = jax.eval_shape(model.init, jax.random.PRNGKey(0), feats)
    target_p = {("pose_decoder",) + k: v for k, v in _flat(tree["params"]).items()}
    target_b = {("pose_decoder",) + k: v for k, v in _flat(tree["batch_stats"]).items()}

    rec = ckpt.Converter({})
    ckpt.convert_pose_decoder(rec)
    sd = {}
    for src, coll, dst, tname in rec.records:
        tgt = target_p if coll == "params" else target_b
        if dst not in tgt:
            continue
        shape = tgt[dst].shape
        if tname == "_t_conv":
            h, w, i, o = shape
            arr = rng.randn(o, i, h, w).astype(np.float32) * 0.1
        else:
            arr = rng.randn(*shape).astype(np.float32) * 0.1
            if dst[-1] == "var":
                arr = np.abs(1 + arr)
        sd[src] = arr

    c = ckpt.Converter(sd)
    ckpt.convert_pose_decoder(c)
    variables = {"params": c.params["pose_decoder"], "batch_stats": c.batch_stats["pose_decoder"]}
    aa, tr = model.apply(variables, feats)
    aa, tr = np.asarray(aa), np.asarray(tr)

    # torch oracle
    def t_conv(h, key, stride=1, pad=0, bias=True):
        return F.conv2d(h, torch.from_numpy(sd[key + ".weight"]),
                        torch.from_numpy(sd[key + ".bias"]) if bias else None,
                        stride=stride, padding=pad)

    def t_bn(h, key):
        return F.batch_norm(
            h, torch.from_numpy(sd[key + ".running_mean"]), torch.from_numpy(sd[key + ".running_var"]),
            torch.from_numpy(sd[key + ".weight"]), torch.from_numpy(sd[key + ".bias"]),
            training=False, eps=1e-5)

    def res_block(h, key, stride):
        o = t_conv(h, key + "left.0", stride=stride, pad=1, bias=False)
        o = F.relu(t_bn(o, key + "left.1"))
        o = t_conv(o, key + "left.3", pad=1, bias=False)
        o = t_bn(o, key + "left.4")
        if stride != 1 or h.shape[1] != o.shape[1]:
            s = t_conv(h, key + "shortcut.0", stride=stride, bias=False)
            s = t_bn(s, key + "shortcut.1")
        else:
            s = h
        return F.relu(o + s)

    def stage(h, key):
        h = t_conv(h, key + ".0")
        h = res_block(h, key + ".1.", 2)
        h = res_block(h, key + ".2.", 1)
        return h

    h = stage(torch.from_numpy(feats_np["res2"]).permute(0, 3, 1, 2), "pose_decoder.layer1")
    h = stage(torch.cat([h, torch.from_numpy(feats_np["res3"]).permute(0, 3, 1, 2)], 1), "pose_decoder.layer2")
    h = stage(torch.cat([h, torch.from_numpy(feats_np["res4"]).permute(0, 3, 1, 2)], 1), "pose_decoder.layer3")
    h = stage(torch.cat([h, torch.from_numpy(feats_np["res5"]).permute(0, 3, 1, 2)], 1), "pose_decoder.layer4")
    h = F.relu(t_conv(h, "pose_decoder.squeeze"))
    h = F.relu(t_conv(h, "pose_decoder.convs.pose_0", pad=1))
    h = F.relu(t_conv(h, "pose_decoder.convs.pose_1", pad=1))
    h = t_conv(h, "pose_decoder.convs.pose_2")
    h = h.mean(dim=(2, 3))
    h = 0.01 * h.reshape(-1, 2, 1, 6)
    want_aa, want_tr = h[..., :3].numpy(), h[..., 3:].numpy()

    np.testing.assert_allclose(aa, want_aa, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(tr, want_tr, atol=2e-5, rtol=1e-4)


def _flat(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


# ------------------------------------------------------------ motion decoder
def test_motion_decoder_v2_conversion_activation_parity():
    """Full converted MotionDecoderV2 vs torch restatement (reference
    dynamo_motion_decoder_mod.py:28-125): layer0 fusion of upsampled res2,
    coarse->fine refinement with conv/conv+relu/squeeze stages, 0.005 output
    scale. Production channel widths, tiny spatial dims."""
    from uni_encoder_tpu.models.motion_decoder import MotionDecoderV2

    rng = np.random.RandomState(5)
    H, W = 32, 64
    feats_np = {
        "res2": rng.randn(1, H // 4, W // 4, 192).astype(np.float32),
        "res3": rng.randn(1, H // 8, W // 8, 384).astype(np.float32),
        "res4": rng.randn(1, H // 16, W // 16, 768).astype(np.float32),
        "res5": rng.randn(1, H // 32, W // 32, 1536).astype(np.float32),
    }
    full_np = rng.randn(1, H, W, 6).astype(np.float32)
    ego_np = (rng.randn(1, 1, 1, 6) * 0.01).astype(np.float32)

    model = MotionDecoderV2(out_dim=3)
    feats = {k: jnp.asarray(v) for k, v in feats_np.items()}
    tree = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.asarray(full_np), feats, jnp.asarray(ego_np)
    )
    target_p = {("motion_decoder",) + k: v for k, v in _flat(tree["params"]).items()}
    target_b = {("motion_decoder",) + k: v for k, v in _flat(tree.get("batch_stats", {})).items()}

    rec = ckpt.Converter({})
    ckpt.convert_motion_decoder(rec, "motion_decoder")
    sd = {}
    for src, coll, dst, tname in rec.records:
        tgt = target_p if coll == "params" else target_b
        if dst not in tgt:
            continue
        shape = tgt[dst].shape
        if tname == "_t_conv":
            h, w, i, o = shape
            arr = rng.randn(o, i, h, w).astype(np.float32) * 0.1
        else:
            arr = rng.randn(*shape).astype(np.float32) * 0.1
            if dst[-1] == "var":
                arr = np.abs(1 + arr)
        sd[src] = arr

    c = ckpt.Converter(sd)
    ckpt.convert_motion_decoder(c, "motion_decoder")
    variables = {"params": c.params["motion_decoder"]}
    if c.batch_stats:
        variables["batch_stats"] = c.batch_stats["motion_decoder"]
    out = model.apply(variables, jnp.asarray(full_np), feats, jnp.asarray(ego_np))

    # ---- torch oracle
    def t_conv(h, key, stride=1, pad=0, bias=True):
        return F.conv2d(h, torch.from_numpy(sd[key + ".weight"]),
                        torch.from_numpy(sd[key + ".bias"]) if bias else None,
                        stride=stride, padding=pad)

    def t_bn(h, key):
        return F.batch_norm(
            h, torch.from_numpy(sd[key + ".running_mean"]), torch.from_numpy(sd[key + ".running_var"]),
            torch.from_numpy(sd[key + ".weight"]), torch.from_numpy(sd[key + ".bias"]),
            training=False, eps=1e-5)

    def elu_block(h, key, stride):
        o = t_conv(h, key + "left.0", stride=stride, pad=1, bias=False)
        o = F.relu(t_bn(o, key + "left.1"))
        o = t_conv(o, key + "left.3", pad=1, bias=False)
        o = t_bn(o, key + "left.4")
        if stride != 1 or h.shape[1] != o.shape[1]:
            s = t_conv(h, key + "shortcut.0", stride=stride, bias=False)
            s = t_bn(s, key + "shortcut.1")
        else:
            s = h
        return F.elu(o + s)

    feat0 = torch.from_numpy(full_np).permute(0, 3, 1, 2)
    r2 = torch.from_numpy(feats_np["res2"]).permute(0, 3, 1, 2)
    feat1 = F.interpolate(r2, scale_factor=2, mode="bilinear", align_corners=False)
    feat1 = t_conv(feat1, "motion_decoder.layer0.0")
    feat1 = elu_block(feat1, "motion_decoder.layer0.1.", 1)
    feat1 = elu_block(feat1, "motion_decoder.layer0.2.", 1)

    feats_t = [feat0, feat1] + [
        torch.from_numpy(feats_np[f"res{k}"]).permute(0, 3, 1, 2) for k in range(2, 6)
    ]

    motion = t_conv(100.0 * torch.from_numpy(ego_np).permute(0, 3, 1, 2), "motion_decoder.res_trans_conv")
    outs = {}
    for s in range(5, -1, -1):
        f = feats_t[s]
        up = F.interpolate(motion, size=f.shape[-2:], mode="bilinear", align_corners=False)
        xa = t_conv(torch.cat([up, f], 1), f"motion_decoder.conv{s}.0", pad=1)
        xb = F.relu(t_conv(xa, f"motion_decoder.conv{s}.1", pad=1))
        motion = t_conv(torch.cat([xa, xb], 1), f"motion_decoder.squeeze{s}") + up
        outs[s] = motion

    for scale in range(4):
        want = (0.005 * outs[scale]).permute(0, 2, 3, 1).numpy()
        got = np.asarray(out[("complete_flow", scale)])
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
