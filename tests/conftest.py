"""Test configuration: force CPU with an 8-device virtual mesh.

Per SURVEY.md §4 implications: multi-chip sharding is validated on a simulated
mesh (``xla_force_host_platform_device_count``) so tests never require TPU
hardware. Pallas kernels are exercised with ``interpret=True`` on CPU.
"""

import os

# Must happen before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("IPK_TPU_INTERPRET", "1")
