"""Dynamic obstacles thrown at the character.

Re-build of sim_obstacle.py (Obstacle/ObstacleManager): in the reference,
obstacles are Bullet bodies created/removed at runtime (launch/throw/update
with TTL, sim_obstacle.py:66-125) and couple to the character through the
common contact solver.  Add/remove is shape-dynamic, so the TPU version is a
fixed-slot pool: each slot is a ballistic body with a TTL mask; inactive
slots are parked far away with zero velocity.  Boxes (the reference throw
default, sim_obstacle.py:92) are carried with their half extents and coupled
through their bounding sphere — a deliberate one-way-ish simplification that
preserves the training purpose (perturbation injection,
envs/env_humanoid_base.py:363-366): obstacles impart impulses on the
character and reflect off it, but do not enter the character's cone-friction
contact solve.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .model import PhysicsModel

SHAPE_SPHERE = 0
SHAPE_BOX = 1


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ObstacleState:
    pos: Any        # (...,S,3)
    vel: Any        # (...,S,3)
    radius: Any     # (...,S) coupling/bounce radius
    half_extents: Any  # (...,S,3) box half extents (== radius for spheres)
    shape: Any      # (...,S) int32: SHAPE_SPHERE | SHAPE_BOX
    mass: Any       # (...,S)
    ttl: Any        # (...,S) seconds remaining; <=0 means inactive
    next_slot: Any  # (...) int32 round-robin cursor

    def tree_flatten(self):
        return (self.pos, self.vel, self.radius, self.half_extents,
                self.shape, self.mass, self.ttl, self.next_slot), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


PARK_DIST = 1000.0


def init_pool(num_slots: int, batch_shape=(), v_up=(0.0, 1.0, 0.0)
              ) -> ObstacleState:
    S = num_slots
    park = -PARK_DIST * jnp.asarray(v_up)
    return ObstacleState(
        pos=jnp.broadcast_to(park, batch_shape + (S, 3)) + 0.0,
        vel=jnp.zeros(batch_shape + (S, 3)),
        radius=jnp.full(batch_shape + (S,), 0.1),
        half_extents=jnp.full(batch_shape + (S, 3), 0.1),
        shape=jnp.zeros(batch_shape + (S,), dtype=jnp.int32),
        mass=jnp.full(batch_shape + (S,), 1.0),
        ttl=jnp.zeros(batch_shape + (S,)),
        next_slot=jnp.zeros(batch_shape, dtype=jnp.int32),
    )


def throw(obs: ObstacleState, rng, target_pos, v_up,
          shape: int = SHAPE_BOX, vel: float = 8.0,
          r_out: float = 2.0, r_in: float = 0.2, mass: float = 2.0,
          size_range=(0.1, 0.3), h_min: float = 0.5,
          ttl: float = 2.0) -> ObstacleState:
    """Launch a ballistic obstacle at the character (sim_obstacle.py:92-113):
    spawn on a random unit direction at r_out (clamped above h_min), aim at
    a random point within r_in of the target, speed `vel`."""
    S = obs.radius.shape[-1]
    k1, k2, k3 = jax.random.split(rng, 3)
    batch = target_pos.shape[:-1]
    d_out = jax.random.normal(k1, batch + (3,))
    d_out = d_out / jnp.maximum(
        jnp.linalg.norm(d_out, axis=-1, keepdims=True), 1e-6)
    d_in = jax.random.normal(k2, batch + (3,))
    d_in = d_in / jnp.maximum(
        jnp.linalg.norm(d_in, axis=-1, keepdims=True), 1e-6)
    half = jax.random.uniform(k3, batch + (3,), minval=size_range[0],
                              maxval=size_range[1]) * 0.5

    up = jnp.asarray(v_up)
    p_from = target_pos + r_out * d_out
    h = jnp.einsum("...i,i->...", p_from, up)
    p_from = p_from + (jnp.maximum(h, h_min) - h)[..., None] * up
    p_to = target_pos + r_in * d_in
    dir_ = p_to - p_from
    dir_ = dir_ / jnp.maximum(jnp.linalg.norm(dir_, axis=-1, keepdims=True),
                              1e-6)
    v = vel * dir_

    radius = jnp.mean(half, axis=-1) if shape == SHAPE_BOX else half[..., 0]

    slot = obs.next_slot
    def put(field, value):
        return field.at[..., slot].set(value) if field.ndim == slot.ndim + 1 \
            else field.at[..., slot, :].set(value)

    return ObstacleState(
        pos=put(obs.pos, p_from),
        vel=put(obs.vel, v),
        radius=put(obs.radius, radius),
        half_extents=put(obs.half_extents, half),
        shape=put(obs.shape, jnp.full(batch, shape, dtype=jnp.int32)),
        mass=put(obs.mass, jnp.full(batch, mass)),
        ttl=put(obs.ttl, jnp.full(batch, ttl)),
        next_slot=jnp.mod(slot + 1, S),
    )


def update(obs: ObstacleState, dt, gravity_vec, v_up=(0.0, 1.0, 0.0),
           ground_height: float = 0.0) -> ObstacleState:
    """Ballistic integration + ground bounce + TTL countdown
    (sim_obstacle.py:114-125 removal becomes parking).  Up-axis aware."""
    up = jnp.asarray(v_up)
    active = (obs.ttl > 0.0)[..., None]
    vel = obs.vel + dt * gravity_vec
    pos = obs.pos + dt * vel
    # ground bounce with the reference obstacle restitution 0.2
    if hasattr(ground_height, "height_at"):
        gh = ground_height.height_at(pos[..., 0], pos[..., 2])
    else:
        gh = ground_height
    h = jnp.einsum("...i,i->...", pos, up) - gh
    vn = jnp.einsum("...i,i->...", vel, up)
    low = (h - obs.radius < 0.0) & (vn < 0.0)
    vel = vel - jnp.where(low, 1.2 * vn, 0.0)[..., None] * up
    pos = pos + jnp.maximum(obs.radius - h, 0.0)[..., None] * up
    ttl = jnp.maximum(obs.ttl - dt, 0.0)
    expired = (ttl <= 0.0)[..., None]
    park = -PARK_DIST * up
    pos = jnp.where(active & ~expired, pos,
                    jnp.where(expired, park, obs.pos))
    vel = jnp.where(active & ~expired, vel, 0.0)
    return ObstacleState(pos=pos, vel=vel, radius=obs.radius,
                         half_extents=obs.half_extents, shape=obs.shape,
                         mass=obs.mass, ttl=ttl, next_slot=obs.next_slot)


class ObstacleContacts:
    """One candidate contact per obstacle slot (deepest character point)."""

    def __init__(self, pos, normal, depth, body, point_idx, active,
                 inv_mass, v_obs):
        self.pos = pos            # (...,S,3) world contact point
        self.normal = normal      # (...,S,3) push direction on the char
        self.depth = depth        # (...,S) penetration (>0 overlapping)
        self.body = body          # (...,S) struck character body
        self.point_idx = point_idx
        self.active = active      # (...,S)
        self.inv_mass = inv_mass  # (...,S) 1/m_obstacle (0 inactive)
        self.v_obs = v_obs        # (...,S,3) obstacle velocity


def detect_obstacle_contacts(model: PhysicsModel, obs: ObstacleState, k_fk,
                             x=None):
    """Narrow phase vs the obstacle's ACTUAL shape: sphere by center
    distance, box by its axis-aligned SDF (thrown boxes do not spin in
    this engine) — no more bounding-sphere corners.  The deepest character
    candidate point per slot becomes a contact row for the unified APGD
    solve (Bullet resolves obstacle contacts in the same solver,
    sim_obstacle.py + stepSimulation).

    x: optional precomputed candidate-point positions (...,NP,3) — the
    fused dynamics kernel already emits them, and the lean FKResult
    carries no velocity fields for contact_point_positions to use."""
    if x is None:
        from .fk import contact_point_positions
        x, _ = contact_point_positions(model, k_fk)      # (...,NP,3)
    r_p = jnp.asarray(model.point_radius)                # (NP,)
    d = x[..., None, :, :] - obs.pos[..., :, None, :]    # (...,S,NP,3)

    # signed distance from each point to the obstacle surface
    q = jnp.abs(d) - obs.half_extents[..., :, None, :]
    outside = jnp.maximum(q, 0.0)
    dist_out = jnp.linalg.norm(outside, axis=-1)
    dist_in = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    sdf_box = dist_out + dist_in
    dist_c = jnp.linalg.norm(d, axis=-1)
    sdf_sph = dist_c - obs.radius[..., :, None]
    is_box = (obs.shape == SHAPE_BOX)[..., :, None]
    sdf = jnp.where(is_box, sdf_box, sdf_sph)
    pen = r_p - sdf                                      # (...,S,NP)

    # normals: sphere radial; box face/edge normal (outside) or closest
    # face (inside)
    sgn = jnp.sign(d)
    n_out = outside * sgn / jnp.maximum(dist_out[..., None], 1e-9)
    face = jax.nn.one_hot(jnp.argmax(q, axis=-1), 3, dtype=d.dtype)
    n_in = face * sgn
    n_box = jnp.where((dist_out > 0)[..., None], n_out, n_in)
    n_sph = d / jnp.maximum(dist_c[..., None], 1e-9)
    normal = jnp.where(is_box[..., None], n_box, n_sph)

    j = jnp.argmax(pen, axis=-1)                         # (...,S)
    take3 = lambda arr: jnp.take_along_axis(
        arr, j[..., None, None], axis=-2)[..., 0, :]
    depth = jnp.take_along_axis(pen, j[..., None], axis=-1)[..., 0]
    active = (depth > 0.0) & (obs.ttl > 0.0)
    inv_mass = jnp.where(active, 1.0 / jnp.maximum(obs.mass, 1e-6), 0.0)
    return ObstacleContacts(
        pos=take3(jnp.broadcast_to(x[..., None, :, :], d.shape)),
        normal=take3(normal), depth=jnp.where(active, depth, -1.0),
        body=jnp.asarray(model.point_body)[j], point_idx=j,
        active=active, inv_mass=inv_mass, v_obs=obs.vel)


def impulses_on_character(model: PhysicsModel, obs: ObstacleState,
                          k_fk, vel_gen, Minv, dt):
    """Obstacle->character coupling: treat an overlapping obstacle as an
    external impulse on the closest contact candidate point.

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
    # n: unit normal from the obstacle center toward the struck point — the
    # push direction on the character.
    n = d / jnp.maximum(dist[..., None], 1e-6)
    n_hit = take(n)                                      # (...,S,3)
    rel_v = obs.vel - take(
        jnp.broadcast_to(v[..., None, :, :], d.shape))
    # impulse magnitude from the approach speed (inelastic-ish)
    jn = jnp.sum(rel_v * n_hit, axis=-1)
    approaching = jn > 0.0
    jn = jnp.maximum(jn, 0.0) * obs.mass
    hit_any = jnp.any(hit, axis=-1) & approaching
    imp = jnp.where(hit_any[..., None], n_hit * jn[..., None], 0.0)
    # obstacles reflect: remove 1.3x of their velocity along the normal
    new_ov = jnp.where(hit_any[..., None],
                       obs.vel - 1.3 * jnp.sum(obs.vel * n_hit,
                                               axis=-1, keepdims=True)
                       * n_hit, obs.vel)
    obs2 = dataclasses.replace(obs, vel=new_ov)
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
