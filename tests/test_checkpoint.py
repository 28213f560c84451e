"""Checkpoint converter completeness: the d2->flax mapping table must cover
every parameter of the production model, with layout-correct shapes.

A synthetic torch-side state dict is generated from the converter's own
recorded mapping (inverse transforms applied to our init shapes), converted,
and compared leaf-by-leaf against a fresh model init. Any unmapped or
misshapen parameter fails. (True d2 key-name agreement additionally requires
a real reference checkpoint, which the release does not ship.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu.config import Config
from uni_encoder_tpu.engine import checkpoint as ckpt
from uni_encoder_tpu.models.oneformer import UniEncoder


def _tree_leaves(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_leaves(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


@pytest.fixture(scope="module")
def init_tree():
    # the test only needs parameter names/shapes -> eval_shape (no XLA
    # compile; the production model's init graph takes minutes on CPU)
    cfg = Config().model
    model = UniEncoder(cfg)
    img = jnp.zeros((1, 64, 128, 3))
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
    return params, bstats


def test_converter_covers_every_param(init_tree):
    params, bstats = init_tree
    target_p = _tree_leaves(params)
    target_b = _tree_leaves(bstats)

    # record the mapping table (empty source)
    rec = ckpt.Converter({})
    ckpt.convert_swin(rec)
    ckpt.convert_msdeform_pixel_decoder(rec)
    ckpt.convert_query_decoder(rec)
    ckpt.convert_transdssl(rec)
    ckpt.convert_pose_decoder(rec)
    ckpt.convert_motion_decoder(rec, "motion_decoder")
    ckpt.convert_motion_decoder(rec, "motion_mask")
    ckpt.convert_task_mlp(rec)

    rng = np.random.RandomState(0)
    state = {}
    for src, coll, dst, tname in rec.records:
        target = target_p if coll == "params" else target_b
        if dst not in target:
            continue  # e.g. identity shortcuts that have no torch params
        shape = target[dst].shape
        if tname == "_t_linear":
            src_shape = shape[::-1]
        elif tname == "_t_conv":
            h, w, i, o = shape
            src_shape = (o, i, h, w)
        else:
            src_shape = shape
        state[src] = rng.randn(*src_shape).astype(np.float32)

    conv_p, conv_b, unused = ckpt.convert_reference_checkpoint(state)
    assert not unused, f"unconverted source keys: {sorted(unused)[:10]}"

    got_p = _tree_leaves(conv_p)
    missing = set(target_p) - set(got_p)
    assert not missing, f"{len(missing)} unmapped params, e.g. {sorted(missing)[:8]}"
    extra = set(got_p) - set(target_p)
    assert not extra, f"{len(extra)} extraneous params, e.g. {sorted(extra)[:8]}"
    for k in target_p:
        assert got_p[k].shape == target_p[k].shape, (k, got_p[k].shape, target_p[k].shape)

    got_b = _tree_leaves(conv_b)
    assert set(got_b) == set(target_b)


def test_legacy_key_migrations():
    state = {
        "sem_seg_head.predictor.query_feat.weight": np.zeros(2),
        "sem_seg_head.predictor.static_query.weight": np.zeros(2),
        "sem_seg_head.adapter_1.weight": np.zeros(2),
        "sem_seg_head.pixel_decoder.mask_features.weight": np.zeros(2),
        "backbone.norm0.weight": np.zeros(2),
    }
    out = ckpt.migrate_legacy_keys(state)
    assert "sem_seg_head.predictor.query_feat.weight" in out
    assert "sem_seg_head.pixel_decoder.adapter_1.weight" in out
    assert "sem_seg_head.pixel_decoder.mask_features.weight" in out
    assert "backbone.norm0.weight" in out
    assert not any("static_query" in k for k in out)


def test_duplicate_input_conv():
    w = np.ones((8, 3, 7, 7), np.float32)
    out = ckpt.duplicate_input_conv({"k": w}, "k")
    assert out["k"].shape == (8, 6, 7, 7)
    np.testing.assert_allclose(out["k"], 0.5)


def test_merge_states():
    a = {"x": np.zeros(1), "y": np.zeros(1)}
    b = {"y": np.ones(1), "z": np.ones(1)}
    m = ckpt.merge_states(a, b)
    assert set(m) == {"x", "y", "z"} and m["y"][0] == 1


def test_dinat_converter_covers_backbone():
    """convert_dinat maps every DiNAT backbone parameter (shape-correct)
    for a small config (depths mirror dinat.py defaults scaled down)."""
    from uni_encoder_tpu.models.backbones.dinat import DiNAT

    depths = (2, 2, 4, 2)
    model = DiNAT(embed_dim=32, depths=depths, num_heads=(1, 2, 4, 8))
    tree = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))
    target = {("backbone",) + k: v for k, v in _tree_leaves(tree["params"]).items()}

    rec = ckpt.Converter({})
    ckpt.convert_dinat(rec, depths=depths)

    rng = np.random.RandomState(0)
    state = {}
    for src, coll, dst, tname in rec.records:
        assert coll == "params"
        assert dst in target, f"convert_dinat maps {src} to nonexistent {dst}"
        shape = target[dst].shape
        if tname == "_t_linear":
            src_shape = shape[::-1]
        elif tname == "_t_conv":
            h, w, i, o = shape
            src_shape = (o, i, h, w)
        else:
            src_shape = shape
        state[src] = rng.randn(*src_shape).astype(np.float32)

    c = ckpt.Converter(state)
    ckpt.convert_dinat(c, depths=depths)
    assert not c.unused
    got = {("backbone",) + k: v for k, v in _tree_leaves(c.params["backbone"]).items()}
    missing = set(target) - set(got)
    assert not missing, f"unmapped: {sorted(missing)[:8]}"
    for k in target:
        assert got[k].shape == target[k].shape, (k, got[k].shape, target[k].shape)
