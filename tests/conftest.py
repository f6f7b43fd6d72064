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
