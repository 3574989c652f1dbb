"""Test configuration: force an 8-device virtual CPU mesh.

The driver environment registers a remote-TPU PJRT plugin at interpreter
startup (sitecustomize) and pins ``jax_platforms``, so plain env vars are
not enough — we must update the jax config before any backend initializes.
Unit tests then run on 8 virtual CPU devices (sharding tests work without
hardware; pallas kernels run via interpret mode or their jnp reference
implementations).  Benchmarks (bench.py) keep the real TPU platform.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
