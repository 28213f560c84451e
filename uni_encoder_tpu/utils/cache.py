"""Persistent-compile-cache setup, keyed by machine fingerprint.

JAX's persistent compilation cache stores CPU AOT artifacts whose generated
code depends on the *host CPU's* feature set (AVX variants etc.), but the
cache key does not include those features. A cache written on one machine
can therefore poison runs on another (cpu_aot_loader "+prefer-no-gather is
not supported on the host machine"). Fix: place each machine's entries in a
subdirectory keyed by a fingerprint of the CPU, so a foreign machine sees an
empty cache instead of unloadable artifacts.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_key() -> str:
    """Short fingerprint of this host's CPU (ISA features + core count)."""
    txt = platform.machine() + "\0" + platform.processor()
    try:
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                # take the first occurrence of EACH key: "model name" appears
                # before "flags" on x86, and stopping at the first match used
                # to drop the feature flags from the key entirely — two hosts
                # with the same CPU model but different enabled features
                # (e.g. hypervisor-masked AVX512/AMX) then shared a cache dir
                key = line.split(":")[0].strip()
                if key in ("flags", "Features", "model name") and key not in seen:
                    seen.add(key)
                    txt += "\0" + line.strip()
                if len(seen) == 3:
                    break
    except OSError:
        pass
    txt += "\0" + str(os.cpu_count())
    # /proc/cpuinfo alone is NOT a sufficient fingerprint under a hypervisor:
    # this container migrates between physical hosts that all virtualize the
    # same generic cpuinfo (model name "Intel(R) Xeon(R) Processor @ 2.10GHz",
    # microcode 0x1, identical flags), while LLVM's host detection (cpuid)
    # sees the real microarch — observed in r4 as cpu_aot_loader
    # "+prefer-no-gather is not supported on the host machine" when loading
    # artifacts cached earlier the same day on a sibling host (SIGILL risk).
    # The host kernel's boot_id discriminates physical machines (and reboots:
    # a cold cache is safe, a poisoned one is not).
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            txt += "\0" + f.read().strip()
    except OSError:
        pass
    import jax

    txt += "\0" + jax.__version__
    return hashlib.sha1(txt.encode()).hexdigest()[:12]


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


def setup_compile_cache(repo_root: str | None = None) -> str:
    """Point jax's persistent compile cache at a machine-keyed subdir of
    <repo>/.jax_cache. Safe to call multiple times. Returns the dir."""
    import jax

    honor_platform_env()
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    d = os.path.join(repo_root, ".jax_cache", machine_key())
    os.makedirs(d, exist_ok=True)
    # the axon sitecustomize imports jax at interpreter startup, so env vars
    # are read too late; jax.config is the reliable path.
    jax.config.update("jax_compilation_cache_dir", d)
    return d
