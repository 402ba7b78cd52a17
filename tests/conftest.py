"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU (SURVEY.md §4.4); the real-TPU
bench path is exercised separately by bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
