"""Dynamic obstacles thrown at the character.

Re-build of sim_obstacle.py (Obstacle/ObstacleManager): in the reference,
obstacles are Bullet bodies created/removed at runtime (launch/throw/update
with TTL, sim_obstacle.py:66-125).  Add/remove is shape-dynamic, so the TPU
version is a fixed-slot pool: each slot is a ballistic sphere with a TTL
mask; inactive slots are parked far away with zero velocity.  Obstacles are
one-way couplers (they hit the character; the character does not deflect
them) — a deliberate simplification that preserves the training purpose
(perturbation injection, envs/env_humanoid_base.py:363-366).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .model import PhysicsModel


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ObstacleState:
    pos: Any        # (...,S,3)
    vel: Any        # (...,S,3)
    radius: Any     # (...,S)
    mass: Any       # (...,S)
    ttl: Any        # (...,S) seconds remaining; <=0 means inactive
    next_slot: Any  # (...) int32 round-robin cursor

    def tree_flatten(self):
        return (self.pos, self.vel, self.radius, self.mass, self.ttl,
                self.next_slot), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


PARK = jnp.asarray([0.0, -1000.0, 0.0])


def init_pool(num_slots: int, batch_shape=()) -> ObstacleState:
    S = num_slots
    return ObstacleState(
        pos=jnp.broadcast_to(PARK, batch_shape + (S, 3)) + 0.0,
        vel=jnp.zeros(batch_shape + (S, 3)),
        radius=jnp.full(batch_shape + (S,), 0.1),
        mass=jnp.full(batch_shape + (S,), 1.0),
        ttl=jnp.zeros(batch_shape + (S,)),
        next_slot=jnp.zeros(batch_shape, dtype=jnp.int32),
    )


def throw(obs: ObstacleState, rng, target_pos, v_up,
          dist_range=(1.0, 2.0), height_range=(0.5, 1.5),
          speed_range=(5.0, 10.0), size_range=(0.1, 0.3),
          ttl: float = 5.0) -> ObstacleState:
    """Launch a ballistic obstacle at the character from a random direction
    (sim_obstacle.py:92-113): spawn on a random bearing, aim at the target."""
    S = obs.radius.shape[-1]
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    theta = jax.random.uniform(k1, target_pos.shape[:-1]) * 2 * jnp.pi
    dist = jax.random.uniform(k2, theta.shape, minval=dist_range[0],
                              maxval=dist_range[1])
    h = jax.random.uniform(k3, theta.shape, minval=height_range[0],
                           maxval=height_range[1])
    speed = jax.random.uniform(k4, theta.shape, minval=speed_range[0],
                               maxval=speed_range[1])
    radius = jax.random.uniform(k5, theta.shape, minval=size_range[0],
                                maxval=size_range[1])

    horiz = jnp.stack([jnp.cos(theta), jnp.zeros_like(theta),
                       jnp.sin(theta)], axis=-1)
    start = target_pos + dist[..., None] * horiz + h[..., None] * v_up
    dir_ = target_pos - start
    dir_ = dir_ / jnp.maximum(jnp.linalg.norm(dir_, axis=-1, keepdims=True),
                              1e-6)
    vel = speed[..., None] * dir_

    slot = obs.next_slot
    def put(field, value):
        return field.at[..., slot].set(value) if field.ndim == slot.ndim + 1 \
            else field.at[..., slot, :].set(value)

    return ObstacleState(
        pos=put(obs.pos, start),
        vel=put(obs.vel, vel),
        radius=put(obs.radius, radius),
        mass=put(obs.mass, 4.0 / 3.0 * jnp.pi * radius ** 3 * 1000.0),
        ttl=put(obs.ttl, jnp.full_like(radius, ttl)),
        next_slot=jnp.mod(slot + 1, S),
    )


def update(obs: ObstacleState, dt, gravity_vec,
           ground_height: float = 0.0) -> ObstacleState:
    """Ballistic integration + ground bounce + TTL countdown
    (sim_obstacle.py:114-125 removal becomes parking)."""
    active = (obs.ttl > 0.0)[..., None]
    vel = obs.vel + dt * gravity_vec
    pos = obs.pos + dt * vel
    # ground bounce with restitution 0.3
    low = pos[..., 1] - obs.radius < ground_height
    vel = vel.at[..., 1].set(
        jnp.where(low & (vel[..., 1] < 0), -0.3 * vel[..., 1], vel[..., 1]))
    pos = pos.at[..., 1].set(
        jnp.maximum(pos[..., 1], ground_height + obs.radius))
    ttl = jnp.maximum(obs.ttl - dt, 0.0)
    expired = (ttl <= 0.0)[..., None]
    pos = jnp.where(active & ~expired, pos, jnp.where(expired, PARK, obs.pos))
    vel = jnp.where(active & ~expired, vel, 0.0)
    return ObstacleState(pos=pos, vel=vel, radius=obs.radius, mass=obs.mass,
                         ttl=ttl, next_slot=obs.next_slot)


def impulses_on_character(model: PhysicsModel, obs: ObstacleState,
                          k_fk, vel_gen, Minv, dt):
    """One-way obstacle->character coupling: treat an overlapping obstacle as
    an external impulse on the closest contact candidate point.

    Returns (delta_vel_gen, obstacle_state') where obstacles bounce off
    elastically from their side as well.
    """
    from .fk import contact_point_positions

    x, v = contact_point_positions(model, k_fk)          # (...,NP,3)
    # pairwise obstacle-point distances
    d = x[..., None, :, :] - obs.pos[..., :, None, :]    # (...,S,NP,3)
    dist = jnp.linalg.norm(d, axis=-1)
    pen = obs.radius[..., None] + 0.05 - dist            # overlap margin
    hit = (pen > 0) & (obs.ttl[..., None] > 0)
    # nearest point per obstacle
    j = jnp.argmax(pen, axis=-1)                         # (...,S)
    take = lambda arr: jnp.take_along_axis(
        arr, j[..., None, None], axis=-2)[..., 0, :]
    n = d / jnp.maximum(dist[..., None], 1e-6)
    n_hit = take(n)                                      # (...,S,3)
    rel_v = obs.vel - take(
        jnp.broadcast_to(v[..., None, :, :], d.shape))
    # impulse magnitude from relative normal velocity (inelastic-ish)
    jn = jnp.sum(rel_v * (-n_hit), axis=-1)
    jn = jnp.maximum(jn, 0.0) * obs.mass
    hit_any = jnp.any(hit, axis=-1)
    imp = jnp.where(hit_any[..., None], (-n_hit) * jn[..., None], 0.0)
    # obstacles reflect
    new_ov = jnp.where(hit_any[..., None],
                       obs.vel - 1.3 * jnp.sum(obs.vel * (-n_hit),
                                               axis=-1, keepdims=True)
                       * (-n_hit), obs.vel)
    obs2 = ObstacleState(pos=obs.pos, vel=new_ov, radius=obs.radius,
                         mass=obs.mass, ttl=obs.ttl,
                         next_slot=obs.next_slot)
    # map world impulses at the struck points into generalized velocity
    from .contacts import contact_jacobian, Contacts
    pts = take(jnp.broadcast_to(x[..., None, :, :], d.shape))
    body = jnp.asarray(model.point_body)[j]
    cons = Contacts(pos=pts, depth=jnp.zeros_like(jn), active=hit_any,
                    body=body, point_idx=j)
    Jc = contact_jacobian(model, k_fk, cons)             # (...,S,3,NV)
    gen_imp = jnp.einsum("...sin,...si->...n", Jc, imp)
    dv = jnp.einsum("...ij,...j->...i", Minv, gen_imp)
    return dv, obs2
