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
# persistent compile cache is TPU-only (CPU AOT artifacts are host-cpuid-
# specific and this VM live-migrates; see uni_encoder_tpu/utils/cache.py) —
# under the CPU override above this call leaves the cache disabled
from uni_encoder_tpu.utils.cache import setup_compile_cache

setup_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- slow marker
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (production-width compiles: minutes on CPU)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: production-width compile tests, excluded by default"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: pass --runslow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
