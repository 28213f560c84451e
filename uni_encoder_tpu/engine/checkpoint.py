"""Checkpoint I/O: native orbax checkpoints + d2 .pkl/.pth conversion.

Capability spec: reference DetectionCheckpointer usage (train_net.py:287-289)
with the d2 `.pkl` format (pickled numpy dict under "model" with
__author__/matching_heuristics flags, tools/convert-pretrained-model-to-d2.py)
and the legacy-key migrations (oneformer_head.py:26-48 "sem_seg_head.* ->
sem_seg_head.pixel_decoder.*"; oneformer_transformer_decoder.py:231-252
"static_query -> query_feat"), plus the merge/duplicate-conv converter tools
(tools/merge_two_pretrained_models.py, tools/single2double_inputs.py).

Conversion maps torch layouts to ours:
  Linear (out,in) -> kernel (in,out);  Conv OIHW -> HWIO;
  nn.MultiheadAttention in_proj_weight (3E,E) -> in_proj (E,3E);
  BatchNorm running stats -> batch_stats {mean,var}, affine -> {scale,bias}.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ------------------------------------------------------------------ raw loads
def load_reference_state(path: str) -> Dict[str, np.ndarray]:
    """Load a d2 .pkl or a torch .pth into a flat {name: np.ndarray} dict,
    applying the reference's legacy-key migrations."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        state = data.get("model", data)
        state = {k: np.asarray(v) for k, v in state.items() if not k.endswith("num_batches_tracked")}
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        state = data.get("model", data.get("state_dict", data))
        state = {
            k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()
            if not k.endswith("num_batches_tracked")
        }
    return migrate_legacy_keys(state)


def migrate_legacy_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        nk = k
        if "static_query" in nk:  # oneformer_transformer_decoder.py:241-244
            nk = nk.replace("static_query", "query_feat")
        # oneformer_head.py:34-42: pre-v2 checkpoints lack the pixel_decoder scope
        if (
            nk.startswith("sem_seg_head.")
            and not nk.startswith("sem_seg_head.predictor")
            and not nk.startswith("sem_seg_head.pixel_decoder.")
            and not nk.startswith("sem_seg_head.depth_decoder.")
        ):
            nk = nk.replace("sem_seg_head.", "sem_seg_head.pixel_decoder.", 1)
        out[nk] = v
    return out


def merge_states(*states: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """tools/merge_two_pretrained_models.py equivalent: dict union, later
    states win."""
    out: Dict[str, np.ndarray] = {}
    for s in states:
        out.update(s)
    return out


def duplicate_input_conv(state: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    """tools/single2double_inputs.py:27-40: duplicate a conv's input channels
    (3 -> 6) for two-frame inputs, halving the weights."""
    out = dict(state)
    w = out[key]
    out[key] = np.concatenate([w, w], axis=1) / 2.0  # OIHW, axis 1 = in
    return out


# ---------------------------------------------------------------- conversion
def _t_linear(v):  # torch Linear weight -> kernel
    return v.T


def _t_conv(v):  # OIHW -> HWIO
    return v.transpose(2, 3, 1, 0)


def set_leaf(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_IDENT = lambda v: v  # noqa: E731


class Converter:
    """Accumulates rule-based mappings from torch names to flax tree paths.

    Every leaf mapping funnels through `_map`, which also records
    (src_key, collection, dst_path, transform_name) — the record doubles as
    the explicit conversion table and powers the round-trip completeness
    test in tests/test_checkpoint.py.
    """

    def __init__(self, state: Dict[str, np.ndarray]):
        self.state = dict(state)
        self.params: Dict = {}
        self.batch_stats: Dict = {}
        self.unused = set(state.keys())
        self.records = []  # (src_key, collection, dst_path, transform_name)

    def _map(self, src: str, dst: Tuple[str, ...], transform=_IDENT, collection="params"):
        self.records.append((src, collection, dst, getattr(transform, "__name__", "ident")))
        if src in self.state:
            self.unused.discard(src)
            tree = self.params if collection == "params" else self.batch_stats
            set_leaf(tree, dst, transform(self.state[src]))

    def linear(self, src: str, dst: Tuple[str, ...]):
        self._map(src + ".weight", dst + ("kernel",), _t_linear)
        self._map(src + ".bias", dst + ("bias",))

    def conv(self, src: str, dst: Tuple[str, ...], bias: bool = True):
        self._map(src + ".weight", dst + ("kernel",), _t_conv)
        if bias:
            self._map(src + ".bias", dst + ("bias",))

    def norm(self, src: str, dst: Tuple[str, ...]):
        """LayerNorm / GroupNorm -> {scale, bias}."""
        self._map(src + ".weight", dst + ("scale",))
        self._map(src + ".bias", dst + ("bias",))

    def bn(self, src: str, dst: Tuple[str, ...]):
        self._map(src + ".weight", dst + ("scale",))
        self._map(src + ".bias", dst + ("bias",))
        self._map(src + ".running_mean", dst + ("mean",), collection="batch_stats")
        self._map(src + ".running_var", dst + ("var",), collection="batch_stats")

    def mha(self, src: str, dst: Tuple[str, ...]):
        self._map(src + ".in_proj_weight", dst + ("in_proj",), _t_linear)
        self._map(src + ".in_proj_bias", dst + ("in_proj_bias",))
        self._map(src + ".out_proj.weight", dst + ("out_proj_kernel",), _t_linear)
        self._map(src + ".out_proj.bias", dst + ("out_proj_bias",))

    def raw(self, src: str, dst: Tuple[str, ...], transform=_IDENT):
        self._map(src, dst, transform)


def convert_swin(c: Converter, depths=(2, 2, 6, 2)) -> None:
    b = "backbone."
    c.conv(b + "patch_embed.proj", ("backbone", "patch_embed_proj"))
    c.norm(b + "patch_embed.norm", ("backbone", "patch_embed_norm"))
    for i, depth in enumerate(depths):
        for j in range(depth):
            src = f"{b}layers.{i}.blocks.{j}."
            dst = ("backbone", f"layers_{i}_blocks_{j}")
            c.norm(src + "norm1", dst + ("norm1",))
            c.norm(src + "norm2", dst + ("norm2",))
            c.raw(src + "attn.qkv.weight", dst + ("attn", "qkv_kernel"), _t_linear)
            c.raw(src + "attn.qkv.bias", dst + ("attn", "qkv_bias"))
            c.raw(src + "attn.proj.weight", dst + ("attn", "proj_kernel"), _t_linear)
            c.raw(src + "attn.proj.bias", dst + ("attn", "proj_bias"))
            c.raw(
                src + "attn.relative_position_bias_table",
                dst + ("attn", "relative_position_bias_table"),
            )
            c.linear(src + "mlp.fc1", dst + ("mlp_fc1",))
            c.linear(src + "mlp.fc2", dst + ("mlp_fc2",))
        if i < len(depths) - 1:
            c.norm(f"{b}layers.{i}.downsample.norm", ("backbone", f"layers_{i}_downsample", "norm"))
            c.raw(
                f"{b}layers.{i}.downsample.reduction.weight",
                ("backbone", f"layers_{i}_downsample", "reduction", "kernel"),
                _t_linear,
            )
        c.norm(f"{b}norm{i}", ("backbone", f"out_norm{i}"))


def convert_resnet(c: Converter, depths=(2, 2, 2, 2), bottleneck=False) -> None:
    """d2 custom ResNet (reference model/modeling/backbone/resnet.py:614-695):
    stem conv1 + per-stage res{2..5}.{j} blocks (conv1/2[/3] + BN +
    optional shortcut)."""
    b = "backbone."
    c.conv(b + "stem.conv1", ("backbone", "stem_conv1"), bias=False)
    c.bn(b + "stem.conv1.norm", ("backbone", "stem_bn1"))
    for i, depth in enumerate(depths):
        for j in range(depth):
            src = f"{b}res{i+2}.{j}."
            dst = ("backbone", f"res{i+2}_block{j}")
            n_convs = 3 if bottleneck else 2
            for k in range(1, n_convs + 1):
                c.conv(src + f"conv{k}", dst + (f"conv{k}",), bias=False)
                c.bn(src + f"conv{k}.norm", dst + (f"bn{k}",))
            c.conv(src + "shortcut", dst + ("shortcut_conv",), bias=False)
            c.bn(src + "shortcut.norm", dst + ("shortcut_bn",))


def convert_convnext(c: Converter, depths=(3, 3, 9, 3)) -> None:
    """reference model/modeling/backbone/convnext.py: stem/downsample_layers,
    stages.{i}.{j} blocks (dwconv, norm, pwconv1/2, gamma), out norm{i}."""
    b = "backbone."
    c.conv(b + "downsample_layers.0.0", ("backbone", "stem_conv"))
    c.norm(b + "downsample_layers.0.1", ("backbone", "stem_norm"))
    for i in range(1, 4):
        c.norm(b + f"downsample_layers.{i}.0", ("backbone", f"downsample_{i}_norm"))
        c.conv(b + f"downsample_layers.{i}.1", ("backbone", f"downsample_{i}_conv"))
    for i, depth in enumerate(depths):
        for j in range(depth):
            src = f"{b}stages.{i}.{j}."
            dst = ("backbone", f"stages_{i}_blocks_{j}")
            c.conv(src + "dwconv", dst + ("dwconv",))
            c.norm(src + "norm", dst + ("norm",))
            c.linear(src + "pwconv1", dst + ("pwconv1",))
            c.linear(src + "pwconv2", dst + ("pwconv2",))
            c.raw(src + "gamma", dst + ("gamma",))
    for i in range(4):
        c.norm(b + f"norm{i}", ("backbone", f"out_norm{i}"))


def convert_dinat(c: Converter, depths=(3, 4, 18, 5)) -> None:
    """reference model/modeling/backbone/dinat.py (D2DiNAT) / NAT release
    checkpoints (tools/convert-pretrained-nat-model-to-d2.py wraps them
    verbatim): patch_embed.proj Sequential(2 convs) + norm, levels.{i}
    .blocks.{j} (norm1/2, attn.{qkv,rpb,proj}, mlp.fc1/2), ConvDownsampler
    reduction/norm, out norm{i}. Default depths = DiNAT-Large."""
    b = "backbone."
    c.conv(b + "patch_embed.proj.0", ("backbone", "tokenizer_conv0"))
    c.conv(b + "patch_embed.proj.1", ("backbone", "tokenizer_conv1"))
    c.norm(b + "patch_embed.norm", ("backbone", "tokenizer_norm"))
    for i, depth in enumerate(depths):
        for j in range(depth):
            src = f"{b}levels.{i}.blocks.{j}."
            dst = ("backbone", f"levels_{i}_blocks_{j}")
            c.norm(src + "norm1", dst + ("norm1",))
            c.norm(src + "norm2", dst + ("norm2",))
            c.raw(src + "attn.qkv.weight", dst + ("attn", "qkv", "kernel"), _t_linear)
            c.raw(src + "attn.qkv.bias", dst + ("attn", "qkv", "bias"))
            c.raw(src + "attn.rpb", dst + ("attn", "rpb"))
            c.linear(src + "attn.proj", dst + ("attn", "proj"))
            c.linear(src + "mlp.fc1", dst + ("mlp_fc1",))
            c.linear(src + "mlp.fc2", dst + ("mlp_fc2",))
        if i < len(depths) - 1:
            c.conv(f"{b}levels.{i}.downsample.reduction", ("backbone", f"downsample_{i}_reduction"), bias=False)
            c.norm(f"{b}levels.{i}.downsample.norm", ("backbone", f"downsample_{i}_norm"))
        c.norm(f"{b}norm{i}", ("backbone", f"out_norm{i}"))


def convert_msdeform_pixel_decoder(c: Converter, prefix="sem_seg_head.pixel_decoder.", dst0="pixel_decoder", layers=6, levels=3):
    trunk = (dst0, "trunk")
    for i in range(levels):
        c.conv(prefix + f"input_proj.{i}.0", trunk + (f"input_proj_{i}_conv",))
        c.norm(prefix + f"input_proj.{i}.1", trunk + (f"input_proj_{i}_gn",))
    c.raw(prefix + "transformer.level_embed", trunk + ("level_embed",))
    for l in range(layers):
        src = prefix + f"transformer.encoder.layers.{l}."
        dst = trunk + (f"encoder_layer_{l}",)
        for name in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
            c.linear(src + f"self_attn.{name}", dst + ("self_attn", name))
        c.norm(src + "norm1", dst + ("norm1",))
        c.norm(src + "norm2", dst + ("norm2",))
        c.linear(src + "linear1", dst + ("linear1",))
        c.linear(src + "linear2", dst + ("linear2",))
    c.conv(prefix + "adapter_1", trunk + ("adapter_1_conv",), bias=False)
    c.norm(prefix + "adapter_1.norm", trunk + ("adapter_1_gn",))
    c.conv(prefix + "layer_1", trunk + ("layer_1_conv",), bias=False)
    c.norm(prefix + "layer_1.norm", trunk + ("layer_1_gn",))
    c.conv(prefix + "mask_features", (dst0, "mask_features"))


def convert_query_decoder(c: Converter, dec_layers=9, class_dec_layers=2, mask_embed_layers=3):
    p = "sem_seg_head.predictor."
    d = ("predictor",)
    c.raw(p + "query_embed.weight", d + ("query_embed",))
    c.raw(p + "level_embed.weight", d + ("level_embed",))
    c.conv(p + "class_input_proj", d + ("class_input_proj",))
    c.norm(p + "decoder_norm", d + ("decoder_norm",))
    c.linear(p + "class_embed", d + ("class_embed",))
    for i in range(mask_embed_layers):
        c.linear(p + f"mask_embed.layers.{i}", d + ("mask_embed", f"layers_{i}"))
    for i in range(class_dec_layers):
        src = p + f"class_transformer.decoder.layers.{i}."
        dst = d + (f"class_dec_{i}",)
        c.mha(src + "self_attn", dst + ("self_attn",))
        c.mha(src + "multihead_attn", dst + ("multihead_attn",))
        for name in ("linear1", "linear2"):
            c.linear(src + name, dst + (name,))
        for name in ("norm1", "norm2", "norm3"):
            c.norm(src + name, dst + (name,))
    c.norm(p + "class_transformer.decoder.norm", d + ("class_transformer_norm",))
    for i in range(dec_layers):
        c.mha(
            p + f"transformer_cross_attention_layers.{i}.multihead_attn",
            d + (f"cross_attn_{i}", "multihead_attn"),
        )
        c.norm(p + f"transformer_cross_attention_layers.{i}.norm", d + (f"cross_attn_{i}", "norm"))
        c.mha(
            p + f"transformer_self_attention_layers.{i}.self_attn",
            d + (f"self_attn_{i}", "self_attn"),
        )
        c.norm(p + f"transformer_self_attention_layers.{i}.norm", d + (f"self_attn_{i}", "norm"))
        c.linear(p + f"transformer_ffn_layers.{i}.linear1", d + (f"ffn_{i}", "linear1"))
        c.linear(p + f"transformer_ffn_layers.{i}.linear2", d + (f"ffn_{i}", "linear2"))
        c.norm(p + f"transformer_ffn_layers.{i}.norm", d + (f"ffn_{i}", "norm"))


def convert_transdssl(c: Converter):
    p = "sem_seg_head.depth_decoder.layers."
    d = ("depth_decoder",)
    for k in range(1, 5):
        c.conv(p + f"layer{k}_rn", d + (f"layer{k}_rn",), bias=False)
    for k in range(5):
        src = p + f"refinenet{k}."
        dst = d + (f"refinenet{k}",)
        for unit in ("resConfUnit1", "resConfUnit2"):
            c.conv(src + f"{unit}.conv1", dst + (unit, "conv1"))
            c.conv(src + f"{unit}.conv2", dst + (unit, "conv2"))
        c.conv(src + "en_atten", dst + ("en_atten",))
        c.conv(src + "out_conv", dst + ("out_conv",))
    for torch_name, ours in (
        ("output_conv4", "output_conv4"),
        ("output_conv3", "output_conv3"),
        ("output_conv2", "output_conv2"),
        ("output_conv", "output_conv"),
    ):
        c.conv(p + torch_name + ".0", d + (f"{ours}_0",))
        c.conv(p + torch_name + ".1", d + (f"{ours}_1",))


def _convert_residual_stage(c: Converter, src: str, dst: Tuple[str, ...], num_blocks=2):
    """make_layer: Sequential(1x1 proj conv, block, block) with torch-BN
    blocks (left.0 conv, left.1 bn, left.3 conv, left.4 bn, shortcut)."""
    c.conv(src + ".0", dst + ("proj",))
    for j in range(num_blocks):
        b = f"{src}.{j + 1}."
        dd = dst + (f"block{j}",)
        c.conv(b + "left.0", dd + ("conv1",), bias=False)
        c.bn(b + "left.1", dd + ("bn1",))
        c.conv(b + "left.3", dd + ("conv2",), bias=False)
        c.bn(b + "left.4", dd + ("bn2",))
        c.conv(b + "shortcut.0", dd + ("shortcut_conv",), bias=False)
        c.bn(b + "shortcut.1", dd + ("shortcut_bn",))


def convert_pose_decoder(c: Converter):
    p = "pose_decoder."
    d = ("pose_decoder",)
    for k in range(1, 5):
        _convert_residual_stage(c, p + f"layer{k}", d + (f"layer{k}",))
    c.conv(p + "squeeze", d + ("squeeze",))
    for i in range(3):
        c.conv(p + f"convs.pose_{i}", d + (f"pose_{i}",))


def convert_motion_decoder(c: Converter, which: str):
    p = which + "."
    d = (which,)
    for k in range(5):
        _convert_residual_stage(c, p + f"layer{k}", d + (f"layer{k}",))
    for s in range(6):
        c.conv(p + f"conv{s}.0", d + (f"conv{s}_0",))
        c.conv(p + f"conv{s}.1", d + (f"conv{s}_1",))
        c.conv(p + f"squeeze{s}", d + (f"squeeze{s}",))
    c.conv(p + "res_trans_conv", d + ("res_trans_conv",))


def convert_task_mlp(c: Converter):
    for i in range(2):
        c.linear(f"task_mlp.layers.{i}", ("task_mlp", f"layers_{i}"))


def convert_reference_checkpoint(
    state: Dict[str, np.ndarray], swin_depths=(2, 2, 6, 2), dec_layers=9
) -> Tuple[Dict, Dict, set]:
    """Full production-config conversion (Swin-T + MSDeformAttnPixelDecoder +
    TransDSSL + query decoder + pose/motion + task MLP).

    Returns (params, batch_stats, unused_source_keys)."""
    c = Converter(state)
    convert_swin(c, swin_depths)
    convert_msdeform_pixel_decoder(c)
    convert_query_decoder(c, dec_layers=dec_layers)
    convert_transdssl(c)
    convert_pose_decoder(c)
    convert_motion_decoder(c, "motion_decoder")
    convert_motion_decoder(c, "motion_mask")
    convert_task_mlp(c)
    return c.params, c.batch_stats, c.unused


# ------------------------------------------------------------------- orbax IO
def save_checkpoint(path: str, variables, step: int = 0) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(path, f"step_{step}")), variables, force=True)
    # StandardCheckpointer is async: block until the write is durable BEFORE
    # publishing the last_checkpoint pointer (a crash in the gap would leave
    # the pointer at a half-written step), and close the background machinery
    # so interpreter shutdown doesn't race its executor.
    ckptr.wait_until_finished()
    ckptr.close()
    with open(os.path.join(path, "last_checkpoint"), "w") as f:
        f.write(f"step_{step}")


def load_checkpoint(path: str, abstract_variables=None):
    import orbax.checkpoint as ocp

    last = os.path.join(path, "last_checkpoint")
    if os.path.isfile(last):
        with open(last) as f:
            step_dir = f.read().strip()
        path = os.path.join(path, step_dir)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_variables)
