"""Persistent-compile-cache setup — TPU artifacts only.

JAX's persistent compilation cache stores XLA:CPU AOT artifacts whose
generated code depends on the *host CPU's* cpuid-detected features (AVX/AMX
variants, gather/scatter tuning), but the cache key does not include them.
Worse, this environment's VM live-migrates between physical hosts WITHOUT a
reboot: /proc/cpuinfo is virtualized identically everywhere and even the
kernel boot_id stays constant across a migration, so NO static host
fingerprint can make CPU AOT artifacts safe — cpu_aot_loader
"+prefer-no-gather is not supported on the host machine ... could lead to
execution errors such as SIGILL" was observed (r4) when loading artifacts
cached earlier the SAME DAY under the SAME boot_id. Every fingerprint
scheme tried (cpuinfo flags, model name, core count, boot_id) failed in
practice.

TPU executables have no such hazard: XLA's own cache key covers the TPU
target (and the serialized program targets the TPU, not the host CPU), and
compiles through the axon tunnel cost 3-10 minutes — exactly what a
persistent cache should amortize. So: enable the persistent cache only when
the effective backend is a TPU; leave it off for CPU runs (tests, the
multichip dryrun), whose in-process jit cache still works within a run.
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Make JAX_PLATFORMS reliable under the axon sitecustomize.

    The axon site plugin force-registers the TPU backend at interpreter
    startup, so `JAX_PLATFORMS=cpu` alone is not honored — and when the
    relay is half-open (TCP hangs instead of refusing) backend discovery
    can block for minutes. `jax.config.update("jax_platforms", ...)` is the
    reliable override (same reason tests/conftest.py sets it)."""
    import jax

    env = os.environ.get("JAX_PLATFORMS", "")
    if env and env != "axon":
        jax.config.update("jax_platforms", env)


def _effective_platform() -> str:
    """The platform jax will use, WITHOUT initializing any backend."""
    import jax

    return jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")


def setup_compile_cache(repo_root: str | None = None) -> str:
    """Point jax's persistent compile cache at <repo>/.jax_cache/tpu when the
    effective backend is a TPU; disable it for CPU backends (see module
    docstring — CPU AOT artifacts are not safe under live migration). Safe
    to call multiple times. Returns the cache dir ("" when disabled)."""
    import jax

    honor_platform_env()
    plat = _effective_platform()
    if not ("axon" in plat or "tpu" in plat):
        # covers "cpu" and any non-TPU backend; "" never happens here (the
        # axon env always sets JAX_PLATFORMS) but would also land on the
        # safe side only if a TPU string is present
        jax.config.update("jax_compilation_cache_dir", None)
        return ""
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    d = os.path.join(repo_root, ".jax_cache", "tpu")
    os.makedirs(d, exist_ok=True)
    # the axon sitecustomize imports jax at interpreter startup, so env vars
    # are read too late; jax.config is the reliable path.
    jax.config.update("jax_compilation_cache_dir", d)
    return d


def disable_compile_cache() -> None:
    """Turn the persistent cache off for the rest of the process — call when
    switching an axon process to the CPU backend (e.g. the multichip dryrun),
    where a previously-enabled cache dir would start collecting unsafe CPU
    AOT artifacts."""
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
