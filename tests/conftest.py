"""Test config: force the CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4 'fake
backend').

Note: this image's sitecustomize registers an ``axon`` TPU backend and
forces ``jax_platforms=axon``; plain ``JAX_PLATFORMS=cpu`` env vars are
therefore not enough — we override the config knob directly before any
backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
