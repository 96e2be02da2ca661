"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on `xla_force_host_platform_device_count=8` CPU devices instead (the XLA
program is the same module that runs over ICI on a real pod slice).
"""

import os
import sys

# Must be set before jax is imported anywhere. Force CPU even if the outer
# environment points at a TPU — tests validate numerics and sharding logic.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
