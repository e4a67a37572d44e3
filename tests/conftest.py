"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU via
``xla_force_host_platform_device_count`` (SURVEY.md section 4); the real-TPU
path is exercised by bench.py and the driver's compile checks.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
