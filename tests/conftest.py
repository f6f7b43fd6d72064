"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py / __graft_entry__.py on hardware;
unit tests validate numerics and sharding on host CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the axon plugin ignores setdefault — force it
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon PJRT plugin appends itself to jax_platforms at import; override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


# XLA:CPU JIT leaves ~80 KB anonymous mappings behind per compiled
# executable (code pages + arena chunks, held by the live compilation
# caches). A full-suite run accumulates past the kernel's default
# vm.max_map_count (65530); the next mmap inside the compiler then fails
# and XLA segfaults — reproducibly ~250 tests in, at whatever test
# compiles next. jax.clear_caches() releases the mappings (measured:
# 3660 -> 569), so shed the caches whenever the process nears the limit;
# the handful of recompiles this forces is noise next to a dead suite.
_MAPS_SOFT_LIMIT = 30000


def _n_maps() -> int:
    try:
        with open("/proc/self/maps") as fh:
            return sum(1 for _ in fh)
    except OSError:  # non-Linux: the kernel limit doesn't exist either
        return 0


def pytest_runtest_teardown(item, nextitem):
    if _n_maps() > _MAPS_SOFT_LIMIT:
        import gc

        jax.clear_caches()
        gc.collect()
