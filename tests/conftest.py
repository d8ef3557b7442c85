"""Test configuration: run everything on CPU with 8 virtual devices.

Tests must be fast and deterministic; the real TPU is reserved for bench.py.
The 8-device virtual CPU mesh exercises the multi-chip sharding path without
hardware (SURVEY.md §4 item 4 / environment contract).

NOTE: this environment's site config pins jax_platforms to "axon,cpu", which
overrides the JAX_PLATFORMS env var — jax.config.update is the reliable knob.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
