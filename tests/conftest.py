"""Test harness: force CPU with 8 virtual devices so sharding tests work
without TPU hardware (SURVEY.md §4).

NOTE: this environment's sitecustomize imports jax at interpreter startup
(axon TPU plugin), so setting os.environ["JAX_PLATFORMS"] here is too late —
use jax.config.update instead, before any backend is initialized.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
