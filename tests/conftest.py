"""Test configuration: CPU backend with 8 virtual devices.

The reference's suite silently skips without a GPU
(`/root/reference/test/runtests.jl:11-14`) — a weakness SURVEY.md §4 flags and we
do not copy: all tests here run on the CPU backend (Pallas kernels in interpret
mode) and multi-chip logic runs against an 8-device virtual CPU mesh via
``xla_force_host_platform_device_count``.

NOTE: in this image the ``JAX_PLATFORMS`` env var is not honored (an experimental
'axon' TPU plugin takes priority); ``jax.config.update`` before first backend use
is, so it must happen at conftest import time, before any test imports jax arrays.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
