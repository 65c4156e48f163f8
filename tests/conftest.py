"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count`` (SURVEY.md §4); the real TPU is
reserved for benches.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize pins JAX_PLATFORMS to the remote TPU
# backend before conftest runs; the in-process config override wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
