"""Spatially-sharded inference: one image split across chips.

The reference scales inference only by batch (DDP replicas; train_net.py's
eval loop — one image per GPU). On TPU the idiomatic extra axis is SPATIAL
sharding: annotate the input image's height dim onto the mesh's data axis
and let GSPMD partition the whole seg forward — convolutions get windowed
halo exchanges, attention/window-partition reshapes get transparent
collectives, and per-chip HBM holds only 1/N of every full-resolution
activation. This is the latency analog of the scaling-book recipe (shard →
propagate → let XLA insert collectives): batch sharding amortizes
throughput, spatial sharding cuts single-image latency and peak memory.

SURVEY.md §5 lists this as the "long-context analog" extension beyond the
reference; tests/test_spatial_sharding.py proves numerics match the
unsharded forward on a virtual 8-device mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image sharding: H over the data axis (halo exchanges ride ICI)."""
    return NamedSharding(mesh, P(None, DATA_AXIS, None, None))


# one jitted apply per model (flax modules are frozen/hashable): a fresh
# jax.jit wrapper per call would never hit the trace cache, forcing a full
# retrace+compile (minutes at flagship width) on every image
_JITTED_APPLY: dict = {}


def spatial_inference(model, variables, images, tasks, mesh: Mesh):
    """Run the seg forward with the image spatially sharded over `mesh`'s
    data axis; params replicated. Returns the model's output dict with
    outputs resharded as GSPMD propagates (masks stay H-sharded until
    fetched). The input H must be divisible by the data-axis size times the
    backbone's total stride for even shards; uneven H falls back to XLA's
    padded partitioning (correct, slightly slower). device_put of params
    already replicated on `mesh` is a no-op transfer-wise."""
    fn = _JITTED_APPLY.get(model)
    if fn is None:
        fn = _JITTED_APPLY[model] = jax.jit(model.apply)
    replicated = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), variables
    )
    images = jax.device_put(images, spatial_image_sharding(mesh))
    tasks = jax.device_put(tasks, NamedSharding(mesh, P()))
    with mesh:
        return fn(replicated, images, tasks)
