"""Streamed cross-attention: interpret-mode parity vs a reference softmax
attention at class-transformer-like shapes (tiny Q, large K, head_dim 32)."""
import jax
import jax.numpy as jnp
import numpy as np

from uni_encoder_tpu.ops.streamed_attention import streamed_cross_attention


def _reference(q, k, v):
    s = jnp.einsum("hqd,hkd->hqk", q, k).astype(jnp.float32)
    s = s * (q.shape[-1] ** -0.5)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hqk,hkd->hqd", a, v.astype(jnp.float32))


def test_streamed_matches_reference_f32():
    rng = np.random.RandomState(0)
    H, Qp, Dh, N = 4, 16, 32, 1024
    q = jnp.asarray(rng.randn(H, Qp, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(H, N, Dh), jnp.float32)
    v = jnp.asarray(rng.randn(H, N, Dh), jnp.float32)
    out = streamed_cross_attention(q, k, v, block_k=256, interpret=True)
    ref = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_streamed_bf16_close_to_f32_reference():
    rng = np.random.RandomState(1)
    H, Qp, Dh, N = 2, 8, 32, 512
    qf = rng.randn(H, Qp, Dh).astype(np.float32)
    kf = rng.randn(H, N, Dh).astype(np.float32)
    vf = rng.randn(H, N, Dh).astype(np.float32)
    out = streamed_cross_attention(
        jnp.asarray(qf, jnp.bfloat16),
        jnp.asarray(kf, jnp.bfloat16),
        jnp.asarray(vf, jnp.bfloat16),
        block_k=256,
        interpret=True,
    )
    ref = _reference(jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )


def test_single_tile_grid():
    rng = np.random.RandomState(2)
    H, Qp, Dh, N = 2, 8, 32, 256
    q = jnp.asarray(rng.randn(H, Qp, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(H, N, Dh), jnp.float32)
    v = jnp.asarray(rng.randn(H, N, Dh), jnp.float32)
    out = streamed_cross_attention(q, k, v, block_k=256, interpret=True)
    ref = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_mha_streamed_branch_matches_dense(monkeypatch):
    """MultiheadAttention with streamed=True (interpret mode off-TPU) must
    match the dense XLA path — covers the pad/slice/out-projection wiring,
    not just the kernel."""
    monkeypatch.setenv("STREAMED_ATTN_INTERPRET", "1")
    monkeypatch.setenv("STREAMED_ATTN", "1")  # opt-in (default off until hw-verified)
    from uni_encoder_tpu.models.layers import MultiheadAttention

    rng = np.random.RandomState(3)
    B, Lq, Lk, E, H = 1, 21, 16384, 64, 8  # Lq deliberately not 8-aligned
    q = jnp.asarray(rng.randn(B, Lq, E), jnp.float32)
    k = jnp.asarray(rng.randn(B, Lk, E), jnp.float32)
    v = jnp.asarray(rng.randn(B, Lk, E), jnp.float32)

    mha_s = MultiheadAttention(E, H, streamed=True)
    variables = mha_s.init(jax.random.PRNGKey(0), q, k, v)
    out_s = mha_s.apply(variables, q, k, v)
    out_d = MultiheadAttention(E, H, streamed=False).apply(variables, q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_d), rtol=2e-4, atol=2e-4
    )


def test_streamed_kill_switch(monkeypatch):
    """STREAMED_ATTN=0 must force the XLA form even with streamed=True —
    bench.py's safe-mode retry relies on this gate being read at trace time."""
    monkeypatch.setenv("STREAMED_ATTN_INTERPRET", "1")
    monkeypatch.setenv("STREAMED_ATTN", "0")
    import uni_encoder_tpu.ops.streamed_attention as sa
    from uni_encoder_tpu.models.layers import MultiheadAttention

    def _boom(*a, **k):  # the kernel must NOT be reached
        raise AssertionError("streamed kernel called despite STREAMED_ATTN=0")

    monkeypatch.setattr(sa, "streamed_cross_attention", _boom)

    rng = np.random.RandomState(4)
    B, Lq, Lk, E, H = 1, 8, 16384, 64, 8
    q = jnp.asarray(rng.randn(B, Lq, E), jnp.float32)
    k = jnp.asarray(rng.randn(B, Lk, E), jnp.float32)
    v = jnp.asarray(rng.randn(B, Lk, E), jnp.float32)
    mha = MultiheadAttention(E, H, streamed=True)
    variables = mha.init(jax.random.PRNGKey(0), q, k, v)
    out = mha.apply(variables, q, k, v)
    assert np.isfinite(np.asarray(out)).all()
