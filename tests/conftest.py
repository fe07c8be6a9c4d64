"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is tested on
a virtual CPU mesh per the SURVEY §4 test strategy (the driver separately
dry-run-compiles the multi-chip path via ``__graft_entry__.dryrun_multichip``).
"""

import os

# Hard-set (the session env pins JAX_PLATFORMS to the TPU tunnel).  NOTE:
# the env var alone is NOT honored once the axon PJRT plugin registers, so
# the jax.config update below is the one that actually takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: repeat test runs skip XLA recompilation.
# The dir is keyed by a host-CPU fingerprint: XLA:CPU AOT executables bake
# in the compile host's ISA features (amx/avx512 variants), and this VM
# migrates between host generations across rounds — loading an entry
# compiled elsewhere SIGILLs/segfaults inside
# compilation_cache.get_executable_and_time (observed round 5, full-suite
# run; cpu_aot_loader logs the feature mismatch just before).  A fresh
# host gets one cold run, then caches normally.


def _host_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


_cache_dir = os.path.join(
    os.path.dirname(__file__), "..", ".jax_cache",
    f"cpu-{_host_fingerprint()}",
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache_dir))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (must import after the env staging above)

jax.config.update("jax_platforms", "cpu")
