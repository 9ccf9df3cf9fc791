"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

All tests run on CPU (the real TPU chip is reserved for benchmarking); sharding
tests exercise an 8-device host-platform mesh exactly like the driver's
multi-chip dry run.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of how pytest is invoked.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The preinstalled 'axon' TPU plugin ignores the env var, so pin the platform
# through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
