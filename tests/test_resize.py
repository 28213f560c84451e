"""Parity of resampling ops vs torch (the reference's numerics)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from uni_encoder_tpu.ops import grid_sample, interpolate  # noqa: E402


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 12), (16, 24)), ((16, 24), (7, 11)), ((5, 5), (13, 9)), ((32, 32), (32, 32))],
)
def test_bilinear_matches_torch(in_hw, out_hw, align_corners):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(interpolate(jnp.asarray(x), size=out_hw, mode="bilinear", align_corners=align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=align_corners)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 12), (16, 24)), ((16, 24), (7, 11))])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(1)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(interpolate(jnp.asarray(x), size=out_hw, mode="nearest"))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_hw, mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(align_corners):
    rng = np.random.RandomState(2)
    x = rng.randn(2, 9, 13, 4).astype(np.float32)
    # grid includes out-of-range points to exercise zero padding
    grid = rng.uniform(-1.3, 1.3, size=(2, 6, 7, 2)).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid), align_corners=align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.grid_sample(
        xt, torch.from_numpy(grid), mode="bilinear", padding_mode="zeros", align_corners=align_corners
    )
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
