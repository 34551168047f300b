"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Mirrors the reference CI strategy of exercising the parallel path on a single
machine (``.github/workflows/CI.yml:42-43`` runs the same suite under
``mpirun -np 3``); here the multi-chip path is validated on a virtual device
mesh instead.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers the TPU plugin and overrides the platform
# programmatically at interpreter start — the env var alone is not enough.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
