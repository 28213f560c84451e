"""Spatially-sharded single-image inference (parallel/spatial.py) on the
virtual 8-device CPU mesh: the seg forward with the image's H dim sharded
over the data axis must compile, execute, and match the unsharded forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_encoder_tpu.parallel.mesh import make_mesh
from uni_encoder_tpu.parallel.spatial import spatial_inference

from tests.test_model_forward import tiny_model  # noqa: F401  (fixture)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatial_matches_unsharded(tiny_model):  # noqa: F811
    cfg, model, variables = tiny_model
    rng = np.random.RandomState(0)
    # H=64 over 8 shards -> 8 rows/shard (stride-4 features: 2 rows/shard);
    # GSPMD inserts halo exchanges for the convs and collectives for the
    # window-partition reshapes and global attention.
    images = jnp.asarray(rng.randn(1, 64, 128, 3), jnp.float32)
    tasks = jnp.ones((1, 77), jnp.int32)

    ref = jax.jit(model.apply)(variables, images, tasks)
    mesh = make_mesh(8, model_parallel=1)
    out = spatial_inference(model, variables, images, tasks, mesh)

    np.testing.assert_allclose(
        np.asarray(out["pred_logits"], np.float32),
        np.asarray(ref["pred_logits"], np.float32),
        atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"], np.float32),
        np.asarray(ref["pred_masks"], np.float32),
        atol=2e-4, rtol=2e-4,
    )
