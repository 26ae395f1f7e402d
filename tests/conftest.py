"""Test harness: force CPU with 8 virtual devices so tests never contend for
the single TPU chip, and sharding tests run without a pod (SURVEY.md §4).

Note: the environment's sitecustomize pins jax_platforms to "axon,cpu"
programmatically, so the JAX_PLATFORMS env var alone is not enough — we must
override the config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
