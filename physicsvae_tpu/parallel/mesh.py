"""Device-mesh scale-out utilities.

Replaces the reference's Ray actor system + DDPPO torch.distributed
allreduce (rllib_driver.py:87-117, SURVEY.md §2.3) with jax.sharding: a
1-axis `data` mesh shards environments and minibatches across chips; XLA
inserts psum over ICI for gradient averaging.  The mesh layout leaves room
for a `model` axis (unused at PhysicsVAE's MLP sizes, but the entry point is
shape-generic).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              model_axis: Optional[str] = None, model_parallel: int = 1):
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if model_axis is None or model_parallel == 1:
        return Mesh(devices.reshape(n), (axis,))
    assert n % model_parallel == 0
    return Mesh(devices.reshape(n // model_parallel, model_parallel),
                (axis, model_axis))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard the leading (batch/env) axis of every leaf over the mesh."""
    def shard(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(shard, tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
