"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (true float64) so that sharding
paths are exercised without TPU hardware; the same suite passes on a real
TPU backend (driver-side).  Env vars must be set before jax imports.
"""

import os
import sys

# Force CPU even when the shell pre-sets JAX_PLATFORMS (e.g. to the TPU
# tunnel): the suite needs true x64 and 8 virtual devices.  jax may already
# be imported by a site hook, so update its config directly too — env vars
# alone are snapshotted at jax import time.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# No-install fallback: when the package isn't pip-installed (the driver
# runs the suite straight from a checkout), resolve it from the repo root.
try:
    import pymbar_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
