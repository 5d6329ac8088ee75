"""Multi-host (DCN) bootstrap: jax.distributed over a coordinator.

Replaces the reference's Ray head/client bootstrap — `ray.init` driven by
the `ip_head` / `redis_password` env vars on a SLURM-style cluster
(rllib_driver.py:26-30, :87-117).  The TPU-native shape is one JAX
process per host, all joined through `jax.distributed.initialize`; after
that `jax.devices()` is the GLOBAL device list, `parallel.mesh.make_mesh`
builds a global mesh, and the existing shard_map/psum training step scales
across hosts with zero further changes (gradient pmean rides ICI within a
pod and DCN across pods).

Bootstrap inputs, by precedence:
  1. explicit arguments,
  2. env vars PVAE_COORDINATOR / PVAE_NUM_PROCESSES / PVAE_PROCESS_ID
     (the moral equivalents of the reference's ip_head bootstrapping),
  3. nothing -> single-process (no-op), exactly like the reference's
     local `ray.init()` fallback.

On CPU backends the cross-process collectives use gloo
(`jax_cpu_collectives_implementation`) — this is what lets
tools/dryrun_multihost.py exercise the full 2-process path on one
machine with virtual devices.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Join the multi-host cluster if configured; returns True iff
    jax.distributed was initialized (idempotent)."""
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator = coordinator or os.environ.get("PVAE_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("PVAE_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("PVAE_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if not coordinator:
        return False  # single-process run

    # CPU backends need an explicit cross-process collectives impl
    # (TPU uses its own ICI/DCN transport).
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover — older/newer jax without the knob
        pass

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True
    return True


def process_info() -> dict:
    """Cluster topology summary for logs/metrics."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
