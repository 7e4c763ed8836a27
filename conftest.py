"""Test configuration: force a virtual 8-device CPU platform.

Tests must not grab the (single) real TPU chip and must be able to exercise
multi-chip sharding; SURVEY.md §4 prescribes
--xla_force_host_platform_device_count for mesh tests.

Note: the axon TPU plugin ignores the JAX_PLATFORMS *env var*, so the
platform must be forced through jax.config before any backend is touched.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
