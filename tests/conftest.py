"""Test configuration: run everything on a virtual 8-device CPU platform.

The environment's sitecustomize (axon TPU plugin) imports jax at interpreter
start, so JAX_PLATFORMS set via os.environ here is TOO LATE — jax has
already latched the env value.  ``jax.config.update("jax_platforms", ...)``
still works because no backend has been initialized yet; XLA_FLAGS is read
at backend init so setting it here is fine.

(The reference had no test suite at all — SURVEY.md §4; we test
multi-device code paths via XLA host-platform device spoofing.)
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# CPU convs default to bf16 passes; tests need f32 numerics
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8
