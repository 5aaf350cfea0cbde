"""Test harness config: run everything on a virtual 8-device CPU backend.

Multi-chip sharding paths are validated on this fake mesh (the standard JAX
trick, since no multi-chip TPU hardware is attached); benchmarks use the
real chip via bench.py instead.

Note: the hosted TPU plugin ignores the JAX_PLATFORMS env var, so the
platform is forced through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
