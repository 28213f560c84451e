"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPUs (SURVEY.md §4d).

Note: the environment exports JAX_PLATFORMS=axon (TPU tunnel); tests must
force-override it, and pin matmul precision to f32 for torch-parity
comparisons.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize force-registers the TPU backend regardless of the
# env var; the config update is the reliable override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache (env var is read too early — the axon
# sitecustomize imports jax at interpreter startup)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
