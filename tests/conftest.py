"""Test configuration: force CPU with an 8-device virtual mesh.

Per SURVEY.md §4 implications: multi-chip sharding is validated on a simulated
mesh (``xla_force_host_platform_device_count``) so tests never require TPU
hardware. Pallas kernels are exercised with ``interpret=True`` on CPU.

Note: the driver environment registers the TPU tunnel platform ('axon') in a
sitecustomize hook that overrides JAX_PLATFORMS, so the env var alone is not
enough — we must also flip jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("IPK_TPU_INTERPRET", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
