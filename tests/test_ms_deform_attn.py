"""Golden parity of the TPU ms_deform_attn core against the reference's
pure-PyTorch spec (`ms_deform_attn_core_pytorch`), imported directly from the
read-only reference tree when present."""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from uni_encoder_tpu.ops import ms_deform_attn

REF = "/root/reference/model/modeling/pixel_decoder/ops/functions/ms_deform_attn_func.py"


def _load_reference_core():
    torch = pytest.importorskip("torch")
    if not os.path.exists(REF):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("ref_msda", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.ms_deform_attn_core_pytorch, torch


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_reference_spec(seed):
    core, torch = _load_reference_core()
    rng = np.random.RandomState(seed)
    B, M, D, Lq, P = 2, 8, 4, 10, 4
    shapes = ((6, 8), (3, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    L = len(shapes)

    value = rng.randn(B, S, M, D).astype(np.float32)
    # include out-of-range sampling locations to exercise zero padding
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    attn = rng.rand(B, Lq, M, L, P).astype(np.float32)
    attn = attn / attn.reshape(B, Lq, M, -1).sum(-1)[..., None, None]

    ref = core(
        torch.from_numpy(value),
        torch.as_tensor(shapes),
        torch.from_numpy(loc),
        torch.from_numpy(attn),
    ).numpy()

    ours = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_gradient_matches_reference_autograd(seed):
    """jax.grad of the gather formulation vs torch autograd through the
    reference spec (`ms_deform_attn_func.py:55-75`), for all three
    differentiable inputs. The reference ships a hand-written CUDA backward
    (`ms_deform_im2col_cuda.cuh:307-927`) whose numerics contract is this
    autograd; training here runs XLA autodiff through the same sampling
    math, so the two must agree."""
    import jax

    core, torch = _load_reference_core()
    rng = np.random.RandomState(seed + 10)
    B, M, D, Lq, P = 2, 4, 4, 9, 4
    shapes = ((5, 7), (3, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    L = len(shapes)

    value = rng.randn(B, S, M, D).astype(np.float32)
    # stay away from exact grid lines: bilinear weights are non-differentiable
    # at integer source coords, where subgradient choice may legitimately
    # differ between implementations
    loc = (rng.uniform(-0.15, 1.15, size=(B, Lq, M, L, P, 2)) + 0.00137).astype(np.float32)
    attn = rng.rand(B, Lq, M, L, P).astype(np.float32)
    attn = attn / attn.reshape(B, Lq, M, -1).sum(-1)[..., None, None]
    cot = rng.randn(B, Lq, M * D).astype(np.float32)

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    out = core(tv, torch.as_tensor(shapes), tl, ta)
    out.backward(torch.from_numpy(cot))

    def f(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) * jnp.asarray(cot))

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)
    )
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), atol=2e-5, rtol=1e-4)
    # location grads scale with H/W; compare with a scale-aware tolerance
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("nsplit", ["2", "4"])
def test_gather_split_matches_default(nsplit, monkeypatch):
    """MSDA_GATHER_SPLIT chunks each per-head gather into n row-ranges —
    must be bit-identical to the single gather (same slices, same order)."""
    monkeypatch.setenv("MSDA_GATHER_SPLIT", nsplit)
    rng = np.random.RandomState(11)
    B, M, D, Lq, P = 1, 2, 32, 16, 4
    shapes = ((4, 6), (2, 3))
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.rand(B, Lq, M, L, P), jnp.float32)

    split = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    monkeypatch.setenv("MSDA_GATHER_SPLIT", "1")
    base = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    np.testing.assert_array_equal(split, base)


@pytest.mark.parametrize(
    "gates",
    [
        {"MSDA_LOC_PER_HEAD": "1"},
        {"MSDA_TABLE_PER_HEAD": "1"},
        {"MSDA_LOC_PER_HEAD": "1", "MSDA_TABLE_PER_HEAD": "1"},
        {
            "MSDA_GATHER_SPLIT": "2",
            "MSDA_LOC_PER_HEAD": "1",
            "MSDA_TABLE_PER_HEAD": "1",
        },  # the shipped r5 winner combo (.bench_gates.json locph_tbl)
    ],
    ids=["locph", "tblph", "locph_tbl", "winner"],
)
def test_per_head_producers_match_default(gates, monkeypatch):
    """MSDA_LOC_PER_HEAD / MSDA_TABLE_PER_HEAD re-emit the index math and
    packed corner tables per head (scheduling overlap, BASELINE.md r5
    matrix 3) — same slices, same arithmetic, must be bit-identical to the
    batched producers."""
    for k, v in gates.items():
        monkeypatch.setenv(k, v)
    rng = np.random.RandomState(13)
    B, M, D, Lq, P = 1, 2, 32, 16, 4
    shapes = ((4, 6), (2, 3))
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.rand(B, Lq, M, L, P), jnp.float32)

    gated = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    for k in ("MSDA_GATHER_SPLIT", "MSDA_LOC_PER_HEAD", "MSDA_TABLE_PER_HEAD"):
        monkeypatch.delenv(k, raising=False)
    base = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    np.testing.assert_array_equal(gated, base)


def test_w16_dg_matches_default(monkeypatch):
    """MSDA_W16_DG keeps the corner weights component-major and contracts
    dim 0 via dot_general — same products, same E matrix, must be
    bit-identical to the transpose+dot form."""
    monkeypatch.setenv("MSDA_W16_DG", "1")
    rng = np.random.RandomState(17)
    B, M, D, Lq, P = 1, 2, 32, 16, 4
    shapes = ((4, 6), (2, 3))
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.rand(B, Lq, M, L, P), jnp.float32)

    gated = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    monkeypatch.delenv("MSDA_W16_DG")
    base = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    np.testing.assert_allclose(gated, base, atol=1e-6, rtol=1e-6)


def test_pmajor_matches_default(monkeypatch):
    """MSDA_PMAJOR gathers point-major (P chains per head, free index
    reshape). The P*4-corner contraction splits into P 4-corner dots summed
    in f32 — same math, different f32 accumulation split, so approximate
    (not bitwise) agreement is the contract."""
    monkeypatch.setenv("MSDA_PMAJOR", "1")
    rng = np.random.RandomState(19)
    B, M, D, Lq, P = 1, 2, 32, 16, 4
    shapes = ((4, 6), (2, 3))
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.rand(B, Lq, M, L, P), jnp.float32)

    gated = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    monkeypatch.delenv("MSDA_PMAJOR")
    base = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    np.testing.assert_allclose(gated, base, atol=2e-6, rtol=1e-5)
