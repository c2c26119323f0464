"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-native analog of a fake distributed backend — multi-chip
sharding logic is exercised on host CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's site config pins jax_platforms to the TPU plugin and
# ignores the env var — override through the config API before any use.
import jax

jax.config.update("jax_platforms", "cpu")
