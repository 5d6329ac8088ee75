"""Ground models: flat plane and heightmap terrain.

Replaces Bullet ray-cast ground-height queries (rayTestBatch,
envs/env_humanoid_tracking.py:295-345) with a bilinear heightmap lookup that
is pure gather arithmetic — vmappable, differentiable, usable inside jit.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Heightmap:
    """Terrain heights over a centered rectangle.

    data: (H, W) heights; size: (sx, sz) world extent; the map is centered at
    the origin like the reference's ground grid
    (envs/env_humanoid_tracking.py:295-316).
    """
    data: Any
    size_x: float
    size_z: float

    def tree_flatten(self):
        return (self.data,), (self.size_x, self.size_z)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], *aux)

    @classmethod
    def from_image_array(cls, img, size=(100.0, 100.0), height_scale=1.0):
        """uint8/float image -> heightmap (image loading is host-side)."""
        data = jnp.asarray(np.asarray(img, dtype=np.float32))
        if data.max() > 1.0:
            data = data / 255.0
        return cls(data * height_scale, float(size[0]), float(size[1]))

    def height_at(self, x, z):
        """Bilinear height lookup at world (x, z); batched."""
        H, W = self.data.shape
        u = (x + 0.5 * self.size_x) / self.size_x * (H - 1)
        v = (z + 0.5 * self.size_z) / self.size_z * (W - 1)
        u = jnp.clip(u, 0.0, H - 1.000001)
        v = jnp.clip(v, 0.0, W - 1.000001)
        u0 = jnp.floor(u).astype(jnp.int32)
        v0 = jnp.floor(v).astype(jnp.int32)
        du = u - u0
        dv = v - v0
        h00 = self.data[u0, v0]
        h01 = self.data[u0, v0 + 1]
        h10 = self.data[u0 + 1, v0]
        h11 = self.data[u0 + 1, v0 + 1]
        return ((1 - du) * (1 - dv) * h00 + (1 - du) * dv * h01
                + du * (1 - dv) * h10 + du * dv * h11)


def ground_height_at(points_xz, heightmap: Heightmap | None = None):
    """Height under each (x, z); 0 for the default flat plane
    (get_ground_height_at parity)."""
    if heightmap is None:
        return jnp.zeros(points_xz.shape[:-1])
    return heightmap.height_at(points_xz[..., 0], points_xz[..., 1])


def check_out_of_ground(root_p, ground_size=(100.0, 100.0, 10.0),
                        v_up_axis: int = 1):
    """Out-of-bounds check (envs/env_humanoid_tracking.py:363-373)."""
    half = jnp.asarray(ground_size) * 0.5
    horiz = [i for i in range(3) if i != v_up_axis]
    p = jnp.stack([root_p[..., horiz[0]], root_p[..., horiz[1]],
                   root_p[..., v_up_axis]], axis=-1)
    return jnp.any((p > half) | (p < -half), axis=-1)
