"""Test harness config: force an 8-virtual-device CPU platform so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4).

Note: in this environment a sitecustomize pre-imports jax and registers a
remote TPU plugin before conftest runs, so env vars alone are too late —
jax.config.update is required to retarget the platform, and XLA_FLAGS must be
set before the *first backend init* (which happens lazily, so here is fine).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
