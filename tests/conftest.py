"""Test configuration: run everything on a virtual 8-device CPU platform.

Must set the env vars before jax initializes a backend (the reference had no
test suite at all — SURVEY.md §4; we test multi-device code paths via XLA's
host-platform device spoofing instead of real chips).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
# CPU convs default to bf16 passes; tests need f32 numerics
jax.config.update("jax_default_matmul_precision", "highest")
