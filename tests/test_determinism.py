"""Determinism hygiene (SURVEY.md §5: the reference leans on
`torch.use_deterministic_algorithms` opt-outs and CUDA atomics make its
MSDeformAttn backward nondeterministic; our XLA path must be bitwise
reproducible — run-to-run AND dispatch-to-dispatch).

Covers the three paths with any room for nondeterminism:
  * the full seg forward (gathers + attention + resize),
  * the fused postprocess (Pallas, interpret mode on CPU),
  * jax.grad of the MSDA op (the reference's CUDA backward uses atomicAdd
    and is NOT deterministic; XLA autodiff of the gather formulation is —
    ref: ms_deform_im2col_cuda.cuh:307-927 vs ops/ms_deform_attn.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_model_forward import tiny_model  # noqa: F401  (fixture)


def _bytes(tree):
    return [np.asarray(l).tobytes() for l in jax.tree_util.tree_leaves(tree)]


def test_seg_forward_bitwise_deterministic(tiny_model):  # noqa: F811
    cfg, model, variables = tiny_model
    images = jnp.asarray(np.random.RandomState(1).randn(1, 64, 128, 3), jnp.float32)
    tasks = jnp.ones((1, 77), jnp.int32)
    f = jax.jit(model.apply)
    a = _bytes(f(variables, images, tasks))
    b = _bytes(f(variables, images, tasks))
    assert a == b


def test_msda_grad_bitwise_deterministic():
    from uni_encoder_tpu.ops import ms_deform_attn

    rng = np.random.RandomState(0)
    shapes = ((8, 12), (4, 6))
    S = sum(h * w for h, w in shapes)
    B, Lq, M, L, P, D = 1, 17, 2, 2, 3, 4
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray(rng.rand(B, Lq, M, L, P, 2), jnp.float32)
    w = jax.nn.softmax(jnp.asarray(rng.randn(B, Lq, M, L * P), jnp.float32)).reshape(
        B, Lq, M, L, P
    )

    def loss(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    a = _bytes(g(value, loc, w))
    b = _bytes(g(value, loc, w))
    assert a == b


def test_fused_postprocess_deterministic():
    from uni_encoder_tpu.inference.fused_postprocess import fused_multitask_inference

    rng = np.random.RandomState(0)
    Q, K, h, w = 20, 7, 16, 32
    cls = jnp.asarray(rng.randn(Q, K + 1), jnp.float32)
    masks = jnp.asarray(rng.randn(Q, h, w), jnp.bfloat16)
    tm = jnp.asarray(np.arange(K) >= K // 2)
    a = _bytes(fused_multitask_inference(cls, masks, tm, topk=Q, interpret=True))
    b = _bytes(fused_multitask_inference(cls, masks, tm, topk=Q, interpret=True))
    assert a == b
