"""Device mesh + sharding rules.

Replaces the reference's torch.distributed/NCCL machinery (detectron2
launch/DDP, comm.gather/synchronize; SURVEY.md §2.9) with the TPU-native
story: one jax.sharding.Mesh with a `data` axis (batch / DDP equivalent,
gradients psum over ICI by pjit) and a `model` axis (tensor-parallel shards
of the large FFN kernels + sequence-parallel sharding of flattened token
activations). Eval-set sharding (InferenceSampler equivalent) is per-host
slicing in data/build.py; metric reduction is a psum inside jit or a host
allgather via multihost_utils.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1, devices=None) -> Mesh:
    """1-D data-parallel mesh by default; 2-D (data, model) when
    model_parallel > 1. Multi-slice/multi-host: pass the global device list —
    axis order keeps data-parallel neighbors on ICI."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def shard_batch(mesh: Mesh, tree):
    """Shard every array's leading (batch) dim over the data axis."""
    def spec(x):
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))

    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec(x)), tree)


def param_spec(path: str, x, min_dim: int = 1024) -> P:
    """Tensor-parallel rule: shard the big FFN / qkv kernels over the model
    axis (column-parallel on the output dim for up-projections, row-parallel
    on the input dim for down-projections); everything else replicated.
    GSPMD inserts the matching collectives. `min_dim` sets the smallest
    kernel width worth sharding (lowered in tests/dryruns so micro configs
    still exercise the TP path)."""
    if x.ndim == 2 and x.shape[-1] >= min_dim and x.shape[-1] % 8 == 0:
        return P(None, MODEL_AXIS)  # e.g. (256, 2048) FFN up / (C, 3C) qkv
    if x.ndim == 2 and x.shape[0] >= min_dim and x.shape[0] % 8 == 0:
        return P(MODEL_AXIS, None)  # FFN down
    return P()


def shard_params(mesh: Mesh, params, min_dim: int = 1024):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def put(path, x):
        name = "/".join(str(p) for p in path)
        return jax.device_put(x, NamedSharding(mesh, param_spec(name, x, min_dim)))

    leaves = [put(p, x) for p, x in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def params_shardings(mesh: Mesh, params, min_dim: int = 1024):
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, param_spec("", x, min_dim)), params
    )


def batch_shardings(mesh: Mesh, batch):
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P(DATA_AXIS, *([None] * (max(x.ndim, 1) - 1)))), batch
    )
