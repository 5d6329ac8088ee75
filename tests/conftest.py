"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware (SURVEY.md §4: vmap/pjit invariance tests via virtual
meshes)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not honored when the axon TPU plugin is present;
# the config update is.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
