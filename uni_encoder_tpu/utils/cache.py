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


def probe_axon_relay(timeout_s: float = 5.0) -> None:
    """Fail fast when this process targets the axon TPU relay and the relay
    is down.

    A dead/half-open relay hangs jax backend discovery for ~25 minutes
    before erroring (measured in BENCH_r03) — probe it with a short TCP
    connect BEFORE importing jax so a dead relay costs seconds, not a whole
    driver window. No-op unless JAX_PLATFORMS names axon (a local/real TPU
    runtime has no relay to probe; CPU runs never touch it). Call this at
    the very top of every TPU entry point, before `import jax` — this module
    deliberately imports jax only inside functions so the probe can run
    first."""
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return
    import sys

    # if jax is already imported and its platform was overridden away from
    # axon (jax.config wins over the env var — see honor_platform_env), the
    # relay is irrelevant to this process
    _jax = sys.modules.get("jax")
    if _jax is not None:
        try:
            plat = _jax.config.jax_platforms
            if plat and "axon" not in plat:
                return
        except Exception:
            pass
    import socket

    ips = os.environ.get("PALLAS_AXON_POOL_IPS", "127.0.0.1").split(",")
    errs = []
    for ip in ips:
        for port in (8083, 8082):
            s = socket.socket()
            s.settimeout(timeout_s)
            try:
                s.connect((ip.strip(), port))
                return  # any reachable relay endpoint => proceed
            except OSError as e:
                errs.append(f"{ip}:{port}: {e}")
            finally:
                s.close()
    print(
        "axon TPU relay unreachable (" + "; ".join(errs) + "); aborting "
        "before jax backend init — a half-open relay hangs discovery for "
        "minutes. Retry when the relay answers, or run with "
        "JAX_PLATFORMS=cpu.",
        file=sys.stderr,
    )
    sys.exit(2)


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
    platforms = {p.strip() for p in plat.split(",") if p.strip()}
    if platforms and not (platforms & {"axon", "tpu"}):
        # explicitly CPU-only (tests, the multichip dryrun): the unsafe
        # combination is a CPU-targeted run on this migrating VM. An empty
        # string (jax autodetect — e.g. a real TPU VM with no env var) and
        # mixed strings ("axon,cpu") keep the cache: their default backend
        # is the TPU and that is what gets compiled.
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
