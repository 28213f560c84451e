"""Whole-model conversion activation parity (VERDICT r2 #2).

One synthetic state dict with the reference's complete d2 key naming is
converted by engine/checkpoint.py, and the *end-to-end* seg and sequence
forwards of the converted flax model are compared against a composed torch
golden restating the reference call stack
(/root/reference/model/oneformer_model.py:217-365) stage by stage:

  backbone -> pixel decoder (deformable encoder + FPN) -> query decoder
  backbone(2B) -> pose -> motion x2 -> TransDSSL

A structure-preserving scaled config is used (every production component,
224x448 input so all Swin stages divide the 7-token window); torch runs in
float64 so the golden is effectively exact arithmetic, and the jax side
pins f32 matmul precision. This is the test that fails if any wiring
(level order, FPN adapter indexing, head routing, memory/pos quirks)
silently diverges.
"""

import dataclasses
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu import config as C
from uni_encoder_tpu.config import Config
from uni_encoder_tpu.engine import checkpoint as ckpt
from uni_encoder_tpu.models.oneformer import UniEncoder

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

DT = torch.float64


# ===================================================================== config
# Two profiles share the whole golden (it reads widths from the state dict):
#  * "scaled"     — structure-preserving narrow widths, runs by default;
#  * "production" — the flagship Swin-T 96/[2,2,6,2] / 150-query / 256-dim
#    config at reduced spatial dims (VERDICT r3 #5): catches width-dependent
#    wiring the scaled config can't (e.g. the reference TransDSSL's hard-coded
#    [96,192,384,768] projections, transdssl.py:332-334). Marked slow —
#    production-width f64 golden + jit compile take minutes on CPU.
PROFILES = {
    "scaled": dict(
        EMBED=32, DEPTHS=(2, 2, 2, 2), HEADS=(1, 2, 4, 8), CONV_DIM=32,
        NQ=8, K=7, ENC_LAYERS=2, DEC_LAYERS=4, DFF=64, NHEADS=4,
        SEG_ATOL=5e-3, SEQ_ATOL=1e-5,
    ),
    "production": dict(
        EMBED=96, DEPTHS=(2, 2, 6, 2), HEADS=(3, 6, 12, 24), CONV_DIM=256,
        NQ=150, K=19, ENC_LAYERS=6, DEC_LAYERS=10, DFF=2048, NHEADS=8,
        # wider accumulations => more f32-vs-f64 rounding headroom
        SEG_ATOL=2e-2, SEQ_ATOL=1e-4,
    ),
}
EMBED = 32
DEPTHS = (2, 2, 2, 2)
HEADS = (1, 2, 4, 8)
CONV_DIM = 32
NQ = 8
K = 7
ENC_LAYERS = 2
DEC_LAYERS = 4  # predictor runs DEC_LAYERS - 1 = 3 rounds (cycles 3 levels)
DFF = 64
NHEADS = 4
SEG_ATOL = 5e-3
SEQ_ATOL = 1e-5
H_IN, W_IN = 224, 448


def _apply_profile(name):
    globals().update(PROFILES[name])


def _cfg():
    swin = C.SwinConfig(embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS)
    of = C.OneFormerConfig(
        num_object_queries=NQ, dec_layers=DEC_LAYERS, class_dec_layers=2,
        dim_feedforward=DFF, hidden_dim=CONV_DIM, nheads=NHEADS,
    )
    head = C.SemSegHeadConfig(
        num_classes=K, convs_dim=CONV_DIM, mask_dim=CONV_DIM,
        transformer_enc_layers=ENC_LAYERS,
    )
    return dataclasses.replace(
        Config().model,
        backbone=C.BackboneConfig(name="swin", swin=swin),
        sem_seg_head=head,
        one_former=of,
    )


# ============================================================== torch helpers
def _t(sd, key):
    return sd[key]


def t_linear(x, sd, key):
    return F.linear(x, sd[key + ".weight"], sd.get(key + ".bias"))


def t_ln(x, sd, key, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), sd[key + ".weight"], sd[key + ".bias"], eps=eps)


def t_conv_nhwc(x, sd, key, stride=1, pad=0, groups=1, bias=True):
    """x NHWC -> conv (torch OIHW weights) -> NHWC."""
    y = F.conv2d(
        x.permute(0, 3, 1, 2), sd[key + ".weight"],
        sd.get(key + ".bias") if bias else None,
        stride=stride, padding=pad, groups=groups,
    )
    return y.permute(0, 2, 3, 1)


def t_gn_nhwc(x, sd, key, groups=32, eps=1e-5):
    y = F.group_norm(x.permute(0, 3, 1, 2), groups, sd[key + ".weight"], sd[key + ".bias"], eps=eps)
    return y.permute(0, 2, 3, 1)


def t_mha(x_q, x_k, x_v, sd, key, nheads, attn_mask=None):
    """torch MultiheadAttention semantics with in_proj/out_proj weights.
    attn_mask: bool (B, 1, Lq, Lk), True = disallowed."""
    E = x_q.shape[-1]
    W = sd[key + ".in_proj_weight"]
    b = sd[key + ".in_proj_bias"]
    q = F.linear(x_q, W[:E], b[:E])
    k = F.linear(x_k, W[E : 2 * E], b[E : 2 * E])
    v = F.linear(x_v, W[2 * E :], b[2 * E :])
    B, Lq, _ = q.shape
    Lk = k.shape[1]
    Dh = E // nheads
    q = q.view(B, Lq, nheads, Dh).transpose(1, 2)
    k = k.view(B, Lk, nheads, Dh).transpose(1, 2)
    v = v.view(B, Lk, nheads, Dh).transpose(1, 2)
    logits = (q @ k.transpose(-2, -1)) / math.sqrt(Dh)
    if attn_mask is not None:
        logits = logits.masked_fill(attn_mask, float("-inf"))
    attn = logits.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(B, Lq, E)
    return F.linear(out, sd[key + ".out_proj.weight"], sd[key + ".out_proj.bias"])


def t_mlp(x, sd, key, num_layers):
    for i in range(num_layers):
        x = F.linear(x, sd[f"{key}.layers.{i}.weight"], sd[f"{key}.layers.{i}.bias"])
        if i < num_layers - 1:
            x = F.relu(x)
    return x


def t_interp(x_nhwc, size=None, scale_factor=None, align_corners=False):
    y = F.interpolate(
        x_nhwc.permute(0, 3, 1, 2), size=size, scale_factor=scale_factor,
        mode="bilinear", align_corners=align_corners,
    )
    return y.permute(0, 2, 3, 1)


def sine_pos_embed(h, w, num_pos_feats):
    y = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x = np.ones((h, 1)) * np.arange(1, w + 1, dtype=np.float64)[None, :]
    eps, scale = 1e-6, 2 * math.pi
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack((np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])), axis=3).reshape(h, w, -1)
    py = np.stack((np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])), axis=3).reshape(h, w, -1)
    return torch.from_numpy(np.concatenate((py, px), axis=2))


# ------------------------------------------------------------------ backbone
def torch_swin_backbone(sd, x):
    """Full D2SwinTransformer golden (NHWC), window 7 with pad/crop."""
    from uni_encoder_tpu.models.backbones.swin import (
        _relative_position_index,
        _shift_attn_mask,
    )

    window = 7

    def block(x, pre, heads, shift):
        B, H, W, Ci = x.shape
        shortcut = x
        h = t_ln(x, sd, pre + "norm1")
        pad_b = (window - H % window) % window
        pad_r = (window - W % window) % window
        if pad_b or pad_r:
            h = F.pad(h.permute(0, 3, 1, 2), (0, pad_r, 0, pad_b)).permute(0, 2, 3, 1)
        Hp, Wp = H + pad_b, W + pad_r
        if shift > 0:
            h = torch.roll(h, shifts=(-shift, -shift), dims=(1, 2))
        N = window * window
        Dh = Ci // heads
        hw = (
            h.view(B, Hp // window, window, Wp // window, window, Ci)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(-1, N, Ci)
        )
        qkv = F.linear(hw, sd[pre + "attn.qkv.weight"], sd[pre + "attn.qkv.bias"])
        qkv = qkv.reshape(-1, N, 3, heads, Dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * Dh ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        idx = _relative_position_index(window, window).reshape(-1)
        rel = sd[pre + "attn.relative_position_bias_table"][idx].reshape(N, N, heads)
        attn = attn + rel.permute(2, 0, 1)[None]
        if shift > 0:
            mask = torch.from_numpy(
                np.asarray(_shift_attn_mask(Hp, Wp, window, shift))
            ).to(DT)
            nW = mask.shape[0]
            attn = attn.view(-1, nW, heads, N, N) + mask[None, :, None]
            attn = attn.view(-1, heads, N, N)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(-1, N, Ci)
        out = F.linear(out, sd[pre + "attn.proj.weight"], sd[pre + "attn.proj.bias"])
        out = (
            out.view(B, Hp // window, Wp // window, window, window, Ci)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(B, Hp, Wp, Ci)
        )
        if shift > 0:
            out = torch.roll(out, shifts=(shift, shift), dims=(1, 2))
        out = out[:, :H, :W]
        x = shortcut + out
        y = t_ln(x, sd, pre + "norm2")
        y = F.linear(y, sd[pre + "mlp.fc1.weight"], sd[pre + "mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[pre + "mlp.fc2.weight"], sd[pre + "mlp.fc2.bias"])
        return x + y

    h = t_conv_nhwc(x, sd, "backbone.patch_embed.proj", stride=4)
    h = t_ln(h, sd, "backbone.patch_embed.norm")
    outs = {}
    for i, depth in enumerate(DEPTHS):
        for j in range(depth):
            h = block(
                h, f"backbone.layers.{i}.blocks.{j}.", HEADS[i],
                0 if j % 2 == 0 else 3,
            )
        outs[f"res{i+2}"] = t_ln(h, sd, f"backbone.norm{i}")
        if i < len(DEPTHS) - 1:
            B, Hh, Ww, Ci = h.shape
            x0 = h[:, 0::2, 0::2]
            x1 = h[:, 1::2, 0::2]
            x2 = h[:, 0::2, 1::2]
            x3 = h[:, 1::2, 1::2]
            h = torch.cat([x0, x1, x2, x3], dim=-1)
            h = t_ln(h, sd, f"backbone.layers.{i}.downsample.norm")
            h = F.linear(h, sd[f"backbone.layers.{i}.downsample.reduction.weight"])
    return outs


# -------------------------------------------------------------- pixel decoder
def _ref_points(shapes):
    pts = []
    for (h, w) in shapes:
        ys = (np.arange(h, dtype=np.float64) + 0.5) / h
        xs = (np.arange(w, dtype=np.float64) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return torch.from_numpy(np.concatenate(pts, axis=0))


def msda_core(value, shapes, loc, attw):
    """Reference ms_deform_attn_core_pytorch semantics (float64)."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    out = torch.zeros(B, M, Lq, D, dtype=DT)
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        hw = h * w
        v = value[:, start : start + hw].permute(0, 2, 1, 3).reshape(B * M, h, w, D)
        start += hw
        g = loc[:, :, :, lvl] * 2 - 1  # grid_sample coords
        g = g.permute(0, 2, 1, 3, 4).reshape(B * M, Lq, P, 2)
        samp = F.grid_sample(
            v.permute(0, 3, 1, 2), g, mode="bilinear",
            padding_mode="zeros", align_corners=False,
        )  # (B*M, D, Lq, P)
        w_l = attw[:, :, :, lvl].permute(0, 2, 1, 3).reshape(B * M, 1, Lq, P)
        out += (samp * w_l).sum(-1).permute(0, 2, 1).reshape(B, M, Lq, D)
    return out.reshape(B, M, Lq * D).transpose(1, 2).reshape(B, Lq, M * D) if False else out.permute(0, 2, 1, 3).reshape(B, Lq, M * D)


def torch_pixel_decoder(sd, feats, prefix="sem_seg_head.pixel_decoder."):
    Cd = CONV_DIM
    M, P = NHEADS, 4  # n_heads follows cfg.one_former.nheads (oneformer.py:107)
    srcs, poss, shapes = [], [], []
    for i, f in enumerate(["res5", "res4", "res3"]):
        x = t_conv_nhwc(feats[f], sd, prefix + f"input_proj.{i}.0")
        x = t_gn_nhwc(x, sd, prefix + f"input_proj.{i}.1")
        srcs.append(x)
        shapes.append((x.shape[1], x.shape[2]))
        poss.append(sine_pos_embed(x.shape[1], x.shape[2], Cd // 2))

    level_embed = sd[prefix + "transformer.level_embed"]
    B = srcs[0].shape[0]
    src_flat = torch.cat([s.reshape(B, -1, Cd) for s in srcs], dim=1)
    pos_flat = torch.cat(
        [p.reshape(1, -1, Cd) + level_embed[i][None, None] for i, p in enumerate(poss)],
        dim=1,
    ).expand(B, -1, -1)
    refp = _ref_points(shapes)

    y = src_flat
    S = y.shape[1]
    for l in range(ENC_LAYERS):
        pre = prefix + f"transformer.encoder.layers.{l}."
        query = y + pos_flat
        value = t_linear(y, sd, pre + "self_attn.value_proj").reshape(B, S, M, Cd // M)
        off = t_linear(query, sd, pre + "self_attn.sampling_offsets")
        off = off.reshape(B, S, M, len(shapes), P, 2)
        w = t_linear(query, sd, pre + "self_attn.attention_weights")
        w = w.reshape(B, S, M, len(shapes) * P).softmax(-1).reshape(B, S, M, len(shapes), P)
        wh = torch.tensor([[ww, hh] for (hh, ww) in shapes], dtype=DT)
        loc = refp[None, :, None, None, None, :] + off / wh[None, None, None, :, None, :]
        attn_out = msda_core(value, shapes, loc, w)
        y2 = t_linear(attn_out, sd, pre + "self_attn.output_proj")
        y = t_ln(y + y2, sd, pre + "norm1")
        y2 = t_linear(F.relu(t_linear(y, sd, pre + "linear1")), sd, pre + "linear2")
        y = t_ln(y + y2, sd, pre + "norm2")

    out = []
    start = 0
    for (h, w) in shapes:
        out.append(y[:, start : start + h * w].reshape(B, h, w, Cd))
        start += h * w

    lat = t_conv_nhwc(feats["res2"], sd, prefix + "adapter_1", bias=False)
    lat = t_gn_nhwc(lat, sd, prefix + "adapter_1.norm")
    up = t_interp(out[-1], size=lat.shape[1:3])
    z = lat + up
    z = t_conv_nhwc(z, sd, prefix + "layer_1", pad=1, bias=False)
    z = t_gn_nhwc(z, sd, prefix + "layer_1.norm")
    z = F.relu(z)
    out.append(z)
    mask_features = t_conv_nhwc(out[-1], sd, prefix + "mask_features")
    return mask_features, out[:3], shapes


# -------------------------------------------------------------- query decoder
def torch_query_decoder(sd, multi_scale, mask_features, task_emb):
    p = "sem_seg_head.predictor."
    Cd = CONV_DIM
    nheads = NHEADS
    B = mask_features.shape[0]
    L = 3
    dec_layers = DEC_LAYERS - 1

    srcs, poss, sizes = [], [], []
    for i in range(L):
        x = multi_scale[i]
        h, w = x.shape[1], x.shape[2]
        sizes.append((h, w))
        poss.append(sine_pos_embed(h, w, Cd // 2).reshape(1, h * w, Cd))
        srcs.append(x.reshape(B, h * w, Cd) + sd[p + "level_embed.weight"][i][None, None])

    def decoder_norm(x):
        return t_ln(x, sd, p + "decoder_norm")

    tasks = decoder_norm(task_emb[:, None, :])
    mh, mw = mask_features.shape[1], mask_features.shape[2]
    pe_mask = sine_pos_embed(mh, mw, Cd // 2).reshape(1, mh * mw, Cd).expand(B, -1, -1)
    proj_mask = t_conv_nhwc(mask_features, sd, p + "class_input_proj").reshape(B, mh * mw, Cd)

    query_embed = sd[p + "query_embed.weight"]
    tgt = tasks.expand(B, NQ - 1, Cd)
    cls_qpos = query_embed[None, : NQ - 1].expand(B, -1, -1)
    for i in range(2):
        pre = p + f"class_transformer.decoder.layers.{i}."
        q = tgt + cls_qpos
        t2 = t_mha(q, q, tgt, sd, pre + "self_attn", nheads)
        tgt = t_ln(tgt + t2, sd, pre + "norm1")
        # reference quirk: memory = PE map, key pos-embed = projected feats
        t2 = t_mha(tgt + cls_qpos, pe_mask + proj_mask, pe_mask, sd, pre + "multihead_attn", nheads)
        tgt = t_ln(tgt + t2, sd, pre + "norm2")
        t2 = F.linear(F.relu(F.linear(tgt, sd[pre + "linear1.weight"], sd[pre + "linear1.bias"])),
                      sd[pre + "linear2.weight"], sd[pre + "linear2.bias"])
        tgt = t_ln(tgt + t2, sd, pre + "norm3")
    out_t = t_ln(tgt, sd, p + "class_transformer.decoder.norm")

    output = torch.cat([out_t, tasks], dim=1)  # (B, NQ, Cd)
    qpos = query_embed[None].expand(B, -1, -1)
    mf_full = mask_features.reshape(B, mh * mw, Cd)

    def attn_mask_for(output, level):
        emb = t_mlp(decoder_norm(output), sd, p + "mask_embed", 3)
        logits_full = torch.einsum("bqc,bnc->bqn", emb, mf_full).reshape(B, NQ, mh, mw)
        # reference: compute at full res, downsample to the level size
        lvl_logits = t_interp(
            logits_full.permute(0, 2, 3, 1), size=sizes[level]
        ).permute(0, 3, 1, 2).reshape(B, NQ, -1)
        masked = torch.sigmoid(lvl_logits) < 0.5
        all_masked = masked.all(-1, keepdim=True)
        masked = torch.where(all_masked, torch.zeros_like(masked), masked)
        return masked[:, None], emb, logits_full

    attn_mask, emb, _ = attn_mask_for(output, 0)
    for i in range(dec_layers):
        lvl = i % L
        pre_c = p + f"transformer_cross_attention_layers.{i}."
        t2 = t_mha(output + qpos, srcs[lvl] + poss[lvl], srcs[lvl], sd,
                   pre_c + "multihead_attn", nheads, attn_mask=attn_mask)
        output = t_ln(output + t2, sd, pre_c + "norm")
        pre_s = p + f"transformer_self_attention_layers.{i}."
        q = output + qpos
        t2 = t_mha(q, q, output, sd, pre_s + "self_attn", nheads)
        output = t_ln(output + t2, sd, pre_s + "norm")
        pre_f = p + f"transformer_ffn_layers.{i}."
        t2 = F.linear(F.relu(F.linear(output, sd[pre_f + "linear1.weight"], sd[pre_f + "linear1.bias"])),
                      sd[pre_f + "linear2.weight"], sd[pre_f + "linear2.bias"])
        output = t_ln(output + t2, sd, pre_f + "norm")
        attn_mask, emb, logits_full = attn_mask_for(output, (i + 1) % L)

    pred_logits = F.linear(decoder_norm(output), sd[p + "class_embed.weight"], sd[p + "class_embed.bias"])
    return pred_logits, logits_full


# ====================================================================== test
@pytest.fixture(
    scope="module",
    params=["scaled", pytest.param("production", marks=pytest.mark.slow)],
)
def converted(request):
    _apply_profile(request.param)
    cfg = _cfg()
    model = UniEncoder(cfg)
    img = jnp.zeros((1, H_IN, W_IN, 3))
    tasks = jnp.zeros((1, 77), jnp.int32)
    v1 = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, tasks)
    v2 = jax.eval_shape(
        lambda r, a, b: model.init(r, a, b, method=UniEncoder.forward_sequence),
        jax.random.PRNGKey(0), img, img,
    )
    params = dict(v1["params"])
    for k, v in v2["params"].items():
        params.setdefault(k, v)
    bstats = dict(v2.get("batch_stats", {}))

    def flat(tree, prefix=()):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(flat(v, prefix + (k,)))
        else:
            out[prefix] = tree
        return out

    target_p, target_b = flat(params), flat(bstats)

    rec = ckpt.Converter({})
    ckpt.convert_swin(rec, DEPTHS)
    ckpt.convert_msdeform_pixel_decoder(rec, layers=ENC_LAYERS)
    ckpt.convert_query_decoder(rec, dec_layers=DEC_LAYERS - 1)
    ckpt.convert_transdssl(rec)
    ckpt.convert_pose_decoder(rec)
    ckpt.convert_motion_decoder(rec, "motion_decoder")
    ckpt.convert_motion_decoder(rec, "motion_mask")
    ckpt.convert_task_mlp(rec)

    # fan-in-scaled weights keep activations O(1) through deep conv chains
    # (unnormalized random weights blow up to ~1e7 through the coarse-to-fine
    # motion stages, where f32-vs-f64 cancellation noise would swamp the
    # parity signal)
    rng = np.random.RandomState(7)
    state = {}
    for src, coll, dst, tname in rec.records:
        tgt = target_p if coll == "params" else target_b
        if dst not in tgt:
            continue
        shape = tgt[dst].shape
        if tname == "_t_linear":
            arr = rng.randn(*shape[::-1]) / math.sqrt(max(shape[0], 1))
        elif tname == "_t_conv":
            h, w, i, o = shape
            arr = rng.randn(o, i, h, w) / math.sqrt(max(h * w * i, 1))
        else:
            arr = rng.randn(*shape) * 0.1
            if dst[-1] == "var":
                arr = np.abs(1 + arr)
            if dst[-1] == "scale" or src.endswith("norm.weight"):
                arr = 1 + 0.1 * rng.randn(*shape)
        state[src] = arr.astype(np.float32)

    c = ckpt.Converter(state)
    ckpt.convert_swin(c, DEPTHS)
    ckpt.convert_msdeform_pixel_decoder(c, layers=ENC_LAYERS)
    ckpt.convert_query_decoder(c, dec_layers=DEC_LAYERS - 1)
    ckpt.convert_transdssl(c)
    ckpt.convert_pose_decoder(c)
    ckpt.convert_motion_decoder(c, "motion_decoder")
    ckpt.convert_motion_decoder(c, "motion_mask")
    ckpt.convert_task_mlp(c)
    assert not c.unused, sorted(c.unused)[:8]

    variables = {"params": c.params}
    if c.batch_stats:
        variables["batch_stats"] = c.batch_stats
    sd = {k: torch.from_numpy(v).to(DT) for k, v in state.items()}
    return request.param, cfg, model, variables, sd


@pytest.fixture(scope="module")
def precise():
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", None)


def test_seg_forward_whole_model_parity(converted, precise):
    profile, cfg, model, variables, sd = converted
    _apply_profile(profile)  # golden fns read the module-level profile globals
    rng = np.random.RandomState(1)
    img = rng.randn(1, H_IN, W_IN, 3).astype(np.float32)
    task_tokens = rng.randint(0, 1000, (1, 77)).astype(np.int32)

    out = jax.jit(model.apply)(variables, jnp.asarray(img), jnp.asarray(task_tokens))
    got_logits = np.asarray(out["pred_logits"])
    got_masks = np.asarray(out["pred_masks"])

    x = torch.from_numpy(img).to(DT)
    feats = torch_swin_backbone(sd, x)
    mask_features, multi_scale, shapes = torch_pixel_decoder(sd, feats)
    task = t_mlp(torch.from_numpy(task_tokens.astype(np.float64)), sd, "task_mlp", 2)
    pred_logits, pred_masks = torch_query_decoder(sd, multi_scale, mask_features, task)

    np.testing.assert_allclose(got_logits, pred_logits.numpy(), atol=SEG_ATOL, rtol=1e-3)
    np.testing.assert_allclose(got_masks, pred_masks.numpy(), atol=SEG_ATOL, rtol=1e-3)


def test_sequence_forward_whole_model_parity(converted, precise):
    profile, cfg, model, variables, sd = converted
    _apply_profile(profile)  # golden fns read the module-level profile globals
    rng = np.random.RandomState(2)
    cur = rng.randn(1, H_IN, W_IN, 3).astype(np.float32) * 0.5
    prev = rng.randn(1, H_IN, W_IN, 3).astype(np.float32) * 0.5

    out = jax.jit(
        lambda v, a, b: model.apply(v, a, b, method=UniEncoder.forward_sequence)
    )(variables, jnp.asarray(cur), jnp.asarray(prev))

    both = torch.from_numpy(np.concatenate([cur, prev], 0)).to(DT)
    feats = torch_swin_backbone(sd, both)
    f_cur = {k: v[:1] for k, v in feats.items()}
    f_prev = {k: v[1:] for k, v in feats.items()}
    f_motion = {k: torch.cat([f_prev[k], f_cur[k]], dim=-1) for k in f_cur}

    # ---- pose decoder
    def t_bn(x, key):
        y = F.batch_norm(
            x.permute(0, 3, 1, 2), sd[key + ".running_mean"], sd[key + ".running_var"],
            sd[key + ".weight"], sd[key + ".bias"], training=False, eps=1e-5)
        return y.permute(0, 2, 3, 1)

    def res_block(h, key, stride, act):
        o = t_conv_nhwc(h, sd, key + "left.0", stride=stride, pad=1, bias=False)
        o = F.relu(t_bn(o, key + "left.1"))
        o = t_conv_nhwc(o, sd, key + "left.3", pad=1, bias=False)
        o = t_bn(o, key + "left.4")
        if stride != 1 or h.shape[-1] != o.shape[-1]:
            s = t_conv_nhwc(h, sd, key + "shortcut.0", stride=stride, bias=False)
            s = t_bn(s, key + "shortcut.1")
        else:
            s = h
        return act(o + s)

    def stage(h, key, stride=2, act=F.relu):
        h = t_conv_nhwc(h, sd, key + ".0")
        h = res_block(h, key + ".1.", stride, act)
        h = res_block(h, key + ".2.", 1, act)
        return h

    h = stage(f_motion["res2"], "pose_decoder.layer1")
    h = stage(torch.cat([h, f_motion["res3"]], -1), "pose_decoder.layer2")
    h = stage(torch.cat([h, f_motion["res4"]], -1), "pose_decoder.layer3")
    h = stage(torch.cat([h, f_motion["res5"]], -1), "pose_decoder.layer4")
    h = F.relu(t_conv_nhwc(h, sd, "pose_decoder.squeeze"))
    h = F.relu(t_conv_nhwc(h, sd, "pose_decoder.convs.pose_0", pad=1))
    h = F.relu(t_conv_nhwc(h, sd, "pose_decoder.convs.pose_1", pad=1))
    h = t_conv_nhwc(h, sd, "pose_decoder.convs.pose_2")
    h = h.mean(dim=(1, 2))
    h = 0.01 * h.reshape(-1, 2, 1, 6)
    aa0, t0 = h[:, 0, :, :3], h[:, 0, :, 3:]
    np.testing.assert_allclose(np.asarray(out["axisangle"]), aa0.numpy(), atol=SEQ_ATOL, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["translation"]), t0.numpy(), atol=SEQ_ATOL, rtol=1e-4)

    # ---- motion decoders (flow out_dim=3, mask out_dim=1)
    ego = torch.cat([t0, aa0], dim=-1).reshape(1, 1, 1, 6)
    full_res = torch.cat([torch.from_numpy(prev).to(DT), torch.from_numpy(cur).to(DT)], dim=-1)

    def motion(which, out_dim):
        feat1 = t_interp(f_motion["res2"], scale_factor=2)
        feat1 = stage(feat1, which + ".layer0", stride=1, act=F.elu)
        feats_t = [full_res, feat1, f_motion["res2"], f_motion["res3"], f_motion["res4"], f_motion["res5"]]
        m = t_conv_nhwc(100.0 * ego, sd, which + ".res_trans_conv")
        outs = {}
        for s in range(5, -1, -1):
            f = feats_t[s]
            up = t_interp(m, size=f.shape[1:3])
            xa = t_conv_nhwc(torch.cat([up, f], -1), sd, f"{which}.conv{s}.0", pad=1)
            xb = F.relu(t_conv_nhwc(xa, sd, f"{which}.conv{s}.1", pad=1))
            m = t_conv_nhwc(torch.cat([xa, xb], -1), sd, f"{which}.squeeze{s}") + up
            outs[s] = m
        return outs

    flow = motion("motion_decoder", 3)
    np.testing.assert_allclose(
        np.asarray(out["complete_flow"]), (0.005 * flow[0]).numpy(), atol=SEQ_ATOL, rtol=1e-4
    )
    prob = motion("motion_mask", 1)
    np.testing.assert_allclose(
        np.asarray(out["motion_mask"]), torch.sigmoid(0.005 * prob[0]).numpy(), atol=SEQ_ATOL, rtol=1e-4
    )

    # ---- TransDSSL depth decoder on the current frame
    dp = "sem_seg_head.depth_decoder.layers."

    def rcu(h, key):
        r = F.relu(h)
        r = t_conv_nhwc(r, sd, key + ".conv1", pad=1)
        r = F.relu(r)
        r = t_conv_nhwc(r, sd, key + ".conv2", pad=1)
        return r + h

    def ffb(key, df, extra=None):
        if extra is not None:
            res = df + extra
            r1 = rcu(extra, key + ".resConfUnit1")
            att = torch.softmax(t_conv_nhwc(r1, sd, key + ".en_atten"), dim=-1)
            o = rcu(res * att, key + ".resConfUnit2") + res
        else:
            o = rcu(df, key + ".resConfUnit2")
        o = t_interp(o, scale_factor=2, align_corners=True)
        return t_conv_nhwc(o, sd, key + ".out_conv")

    def head(x, name):
        x = t_conv_nhwc(x, sd, dp + name + ".0", pad=1)
        x = t_conv_nhwc(x, sd, dp + name + ".1", pad=1)
        z = torch.softmax(x, dim=-1)
        grid = torch.linspace(0.01, 1.0, x.shape[-1], dtype=DT)
        return (z * grid).sum(-1, keepdim=True)

    l1 = t_conv_nhwc(f_cur["res2"], sd, dp + "layer1_rn", bias=False)
    l2 = t_conv_nhwc(f_cur["res3"], sd, dp + "layer2_rn", bias=False)
    l3 = t_conv_nhwc(f_cur["res4"], sd, dp + "layer3_rn", bias=False)
    l4 = t_conv_nhwc(f_cur["res5"], sd, dp + "layer4_rn", bias=False)
    path4 = ffb(dp + "refinenet4", l4)
    path3 = ffb(dp + "refinenet3", path4, l3)
    path2 = ffb(dp + "refinenet2", path3, l2)
    path1 = ffb(dp + "refinenet1", path2, l1)
    l0 = t_interp(l1, scale_factor=2, align_corners=True)
    path0 = ffb(dp + "refinenet0", path1, l0)
    disp0 = head(path0, "output_conv")
    np.testing.assert_allclose(np.asarray(out["disp"]), disp0.numpy(), atol=SEQ_ATOL, rtol=1e-4)
