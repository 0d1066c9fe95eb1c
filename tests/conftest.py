"""Test harness: force CPU with an 8-device virtual mesh so sharding tests
run without TPU hardware (SURVEY.md §4).

Note: in the axon-tunneled environment the JAX_PLATFORMS env var is ignored
by the plugin; ``jax.config.update`` is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
