"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware (SURVEY.md §4: vmap/pjit invariance tests via virtual
meshes)."""
import os

if os.environ.get("PVAE_TEST_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # No persistent compilation cache for the CPU test suite: writing
    # certain large CPU executables (test_pipeline's demo-gen rollout)
    # crashes inside compilation_cache.put_executable_and_time
    # (SIGABRT/SIGSEGV during serialization) — reproduced 3x at the
    # same test, never when the entry already existed.  Disabling the
    # cache entirely keeps the suite deterministic; CPU compiles here
    # are small.
    os.environ.setdefault("PHYSICSVAE_CACHE_DIR", "")

import jax  # noqa: E402

if os.environ.get("PVAE_TEST_TPU") != "1":
    # The env var alone is not honored when the axon TPU plugin is
    # present; the config update is.  PVAE_TEST_TPU=1 opts a run onto
    # the real chip (e.g. fidelity suite with the opt-in Pallas kernels,
    # which have no CPU lowering outside interpret mode).
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
