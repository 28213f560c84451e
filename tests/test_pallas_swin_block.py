"""Fused Swin-block megakernel (interpret mode) vs the XLA SwinBlock path:
unshifted + shifted, with image padding (H, W not multiples of the window)
so the valid-mask and per-window shift-mask signature machinery is covered.

Tolerance: the kernel uses tanh-approximate gelu (exact gelu lowers through
erfc, which Mosaic cannot lower on TPU); the XLA reference path uses exact
gelu, so the comparison carries the approximation's ~3e-3 ceiling.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uni_encoder_tpu.models.backbones.swin import SwinBlock


def _run(shift, H=18, W=23, C=32, heads=2, monkeypatch=None):
    rng = np.random.RandomState(0 if shift == 0 else 1)
    x = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)
    blk = SwinBlock(dim=C, num_heads=heads, window=7, shift=shift)
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(v, x)  # XLA path (no env var, CPU backend)

    monkeypatch.setenv("SWIN_FUSED_INTERPRET", "1")
    out = blk.apply(v, x)  # fused path, interpret mode
    return np.asarray(out), np.asarray(ref)


@pytest.mark.parametrize("shift", [0, 3])
def test_fused_block_matches_xla(shift, monkeypatch):
    out, ref = _run(shift, monkeypatch=monkeypatch)
    np.testing.assert_allclose(out, ref, rtol=4e-3, atol=4e-3)


def test_fused_block_window_multiple_no_pad(monkeypatch):
    # exact window multiples (no image padding), odd window count to force
    # window-count padding to the wb=8 block size
    out, ref = _run(0, H=21, W=35, monkeypatch=monkeypatch)
    np.testing.assert_allclose(out, ref, rtol=4e-3, atol=4e-3)


def test_fused_block_shifted_bigger(monkeypatch):
    # several window rows/cols so interior/edge/corner signatures all occur
    out, ref = _run(3, H=28, W=42, monkeypatch=monkeypatch)
    np.testing.assert_allclose(out, ref, rtol=4e-3, atol=4e-3)


def test_fused_block_wide_heads_fall_back_to_xla(monkeypatch):
    # heads > 6 must NOT take the fused path (wb would need to be 8 for
    # sublane alignment, and the (H, T, T) bias tile then exceeds VMEM for
    # the wide stages) — both runs execute the identical XLA path bitwise
    out, ref = _run(3, H=18, W=23, C=32, heads=8, monkeypatch=monkeypatch)
    np.testing.assert_array_equal(out, ref)


def test_fused_block_batch2(monkeypatch):
    # B=2 (the two-frame sequence pass): windows tile per image, a wb block
    # may straddle images
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 18, 23, 32), jnp.float32)
    blk = SwinBlock(dim=32, num_heads=2, window=7, shift=3)
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(v, x)
    monkeypatch.setenv("SWIN_FUSED_INTERPRET", "1")
    out = blk.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=4e-3, atol=4e-3)
