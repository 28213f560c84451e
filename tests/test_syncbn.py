"""SyncBN proof (reference config NORM: "SyncBN",
Base-Cityscapes-UnifiedSegmentation.yaml:15): under jit with the batch
sharded over the mesh's data axis, train-mode BatchNorm statistics must
equal the GLOBAL-batch computation — GSPMD turns the batch-axis mean into a
cross-replica reduction, which is exactly torch SyncBN's semantics.
Runs on the virtual 8-device CPU mesh from conftest."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from uni_encoder_tpu.models.layers import FrozenBatchNorm
from uni_encoder_tpu.parallel.mesh import make_mesh


def test_train_bn_stats_are_global_under_sharded_jit():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8, model_parallel=1)
    C = 4
    rng = np.random.RandomState(0)
    # per-shard distributions differ wildly so per-shard stats != global stats
    x = np.concatenate(
        [rng.randn(2, 4, 4, C) * (i + 1) + 3 * i for i in range(8)], axis=0
    ).astype(np.float32)

    bn = FrozenBatchNorm(C, use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, C)))

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data", None, None, None)))

    @jax.jit
    def step(v, inp):
        out, mut = bn.apply(v, inp, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    with mesh:
        out, stats = step(variables, xs)
    got_mean = np.asarray(stats["mean"])
    got_var = np.asarray(stats["var"])

    # global-batch reference on one device
    flat = x.reshape(-1, C)
    g_mean = flat.mean(0)
    g_var = flat.var(0) * flat.shape[0] / (flat.shape[0] - 1)  # unbiased
    exp_mean = 0.1 * g_mean  # momentum 0.9 update from zeros/ones init
    exp_var = 0.9 * 1.0 + 0.1 * g_var

    np.testing.assert_allclose(got_mean, exp_mean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_var, exp_var, rtol=1e-5, atol=1e-5)

    # and per-shard stats would NOT match (sanity that the test can fail)
    shard_mean = x[:2].reshape(-1, C).mean(0)
    assert not np.allclose(0.1 * shard_mean, exp_mean, rtol=1e-3)
