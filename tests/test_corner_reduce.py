"""Fused corner-weighted reduction: interpret-mode parity (fwd) vs the XLA
two-dot form, and custom-VJP parity vs autodiff of that form."""
import jax
import jax.numpy as jnp
import numpy as np

from uni_encoder_tpu.ops.corner_reduce import (
    _mats,
    _tile,
    _tile_rows,
    corner_weighted_reduce,
    corner_weighted_reduce_rows,
)


def _xla_reduce(g, w16, D):
    K = g.shape[1] // D
    E, S = _mats(K, D)
    E_m = jnp.asarray(E, g.dtype)
    S_m = jnp.asarray(S, g.dtype)
    wrow = jnp.dot(w16.astype(g.dtype), E_m, preferred_element_type=g.dtype)
    return jnp.dot(g * wrow, S_m, preferred_element_type=jnp.float32)


def test_tile_picker():
    assert _tile(43008) == 1024
    assert _tile(2016) in range(8, 1025, 8) and 2016 % _tile(2016) == 0
    assert _tile(24) == 24
    assert _tile(7) == 0  # not a multiple of 8 -> caller falls back


def test_forward_parity_f32():
    rng = np.random.RandomState(0)
    Lq, K, D = 64, 16, 32
    g = jnp.asarray(rng.randn(Lq, K * D), jnp.float32)
    w = jnp.asarray(rng.rand(Lq, K), jnp.float32)
    out = corner_weighted_reduce(g, w, D, True)
    ref = _xla_reduce(g, w, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_forward_parity_bf16_exact():
    """E/S are 0/1 selections: the Pallas kernel must match the XLA two-dot
    form BIT-EXACTLY at bf16 inputs (both accumulate the 16 products f32)."""
    rng = np.random.RandomState(1)
    Lq, K, D = 128, 16, 32
    g = jnp.asarray(rng.randn(Lq, K * D), jnp.bfloat16)
    w = jnp.asarray(rng.rand(Lq, K), jnp.float32)
    out = corner_weighted_reduce(g, w, D, True)
    ref = _xla_reduce(g, w, D)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def _xla_reduce_rows(g, w4, P, D):
    """Naive restatement: out[q] = sum_{p,c} w4[qP+p, c] * g[qP+p, cD:(c+1)D]."""
    rows, CD = g.shape
    C = CD // D
    G = np.asarray(g, np.float32).reshape(rows // P, P, C, D)
    W = np.asarray(w4, np.float32).reshape(rows // P, P, C)
    return (G * W[..., None]).sum(axis=(1, 2))


def test_rows_tile_picker():
    assert _tile_rows(43008 * 4, 4) == 2048
    assert _tile_rows(64, 4) == 64
    assert _tile_rows(36, 4) == 0  # not a multiple of 32


def test_rows_forward_parity():
    rng = np.random.RandomState(3)
    Lq, P, C, D = 64, 4, 4, 32
    g = jnp.asarray(rng.randn(Lq * P, C * D), jnp.float32)
    w = jnp.asarray(rng.rand(Lq * P, C), jnp.float32)
    out = corner_weighted_reduce_rows(g, w, P, D, True)
    assert out.shape == (Lq, D)
    np.testing.assert_allclose(
        np.asarray(out), _xla_reduce_rows(g, w, P, D), rtol=1e-5, atol=1e-5
    )


def test_rows_matches_qmajor_kernel_bf16():
    """The two kernels compute the same reduction from the two layouts of
    the same data; at bf16 both accumulate the 16 products in f32."""
    rng = np.random.RandomState(4)
    Lq, P, C, D = 32, 4, 4, 32
    g_rows = jnp.asarray(rng.randn(Lq * P, C * D), jnp.bfloat16)
    w_rows = jnp.asarray(rng.rand(Lq * P, C), jnp.float32)
    out_rows = corner_weighted_reduce_rows(g_rows, w_rows, P, D, True)
    g_q = g_rows.reshape(Lq, P * C * D)
    w_q = w_rows.reshape(Lq, P * C)
    out_q = corner_weighted_reduce(g_q, w_q, D, True)
    np.testing.assert_allclose(
        np.asarray(out_rows), np.asarray(out_q), rtol=1e-6, atol=1e-6
    )


def test_rows_vjp_matches_autodiff():
    rng = np.random.RandomState(5)
    Lq, P, C, D = 16, 4, 4, 8
    g = jnp.asarray(rng.randn(Lq * P, C * D), jnp.float32)
    w = jnp.asarray(rng.rand(Lq * P, C), jnp.float32)

    def loss_fused(g, w):
        return jnp.sum(jnp.sin(corner_weighted_reduce_rows(g, w, P, D, True)))

    def loss_ref(g, w):
        G = g.reshape(Lq, P, C, D)
        W = w.reshape(Lq, P, C)
        return jnp.sum(jnp.sin((G * W[..., None]).sum(axis=(1, 2))))

    dg_f, dw_f = jax.grad(loss_fused, argnums=(0, 1))(g, w)
    dg_x, dw_x = jax.grad(loss_ref, argnums=(0, 1))(g, w)
    np.testing.assert_allclose(np.asarray(dg_f), np.asarray(dg_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_f), np.asarray(dw_x), rtol=1e-5, atol=1e-5)


def test_vjp_matches_xla_autodiff():
    rng = np.random.RandomState(2)
    Lq, K, D = 32, 16, 8
    g = jnp.asarray(rng.randn(Lq, K * D), jnp.float32)
    w = jnp.asarray(rng.rand(Lq, K), jnp.float32)

    def loss_fused(g, w):
        return jnp.sum(jnp.sin(corner_weighted_reduce(g, w, D, True)))

    def loss_xla(g, w):
        return jnp.sum(jnp.sin(_xla_reduce(g, w, D)))

    dg_f, dw_f = jax.grad(loss_fused, argnums=(0, 1))(g, w)
    dg_x, dw_x = jax.grad(loss_xla, argnums=(0, 1))(g, w)
    np.testing.assert_allclose(np.asarray(dg_f), np.asarray(dg_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_f), np.asarray(dw_x), rtol=1e-5, atol=1e-5)
