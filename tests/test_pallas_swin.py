"""Fused Pallas window-attention kernel vs the XLA WindowAttention path
(interpret mode on CPU; the TPU-compiled kernel parity is exercised by the
integration flag SwinTransformer.use_pallas_attention)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu.models.backbones.swin import (
    WindowAttention,
    _shift_attn_mask,
    _relative_position_index,
    window_partition,
)
from uni_encoder_tpu.ops.pallas_swin import window_attention_fused, window_mask_ids


@pytest.mark.parametrize("shift", [0, 3])
def test_fused_window_attention_matches_xla(shift):
    rng = np.random.RandomState(0)
    B, Hp, Wp, C, H, WIN = 2, 14, 21, 32, 4, 7
    x = jnp.asarray(rng.randn(B, Hp, Wp, C), jnp.float32)

    mod = WindowAttention(C, WIN, H, True)
    xw = window_partition(x, WIN)
    mask = jnp.asarray(_shift_attn_mask(Hp, Wp, WIN, shift)) if shift else None
    variables = mod.init(jax.random.PRNGKey(0), xw, mask)
    ref = mod.apply(variables, xw, mask)

    p = variables["params"]
    N = WIN * WIN
    idx = _relative_position_index(WIN, WIN).reshape(-1)
    rel = np.asarray(p["relative_position_bias_table"])[idx].reshape(N, N, H).transpose(2, 0, 1)
    mids = jnp.asarray(np.tile(window_mask_ids(Hp, Wp, WIN), B))

    out = window_attention_fused(
        xw, p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"], p["proj_bias"],
        jnp.asarray(rel), mids, WIN, H, shift, group=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
