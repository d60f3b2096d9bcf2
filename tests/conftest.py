"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip hardware is not available in CI; sharding correctness is tested
on a virtual CPU mesh exactly like the reference tests distributed logic
with multi-chare runs on a single box (SURVEY.md §4.2 asynclogic).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
