"""Batched forward kinematics.

Computes world-frame link poses and velocities from a SimState; this is the
TPU equivalent of Bullet's getLinkStates(computeLinkVelocity=True) used by the
state builders and rewards (reference bullet/bullet_utils.py:39-66).

Link state convention matches Bullet: reported positions/velocities refer to
the link COM; orientation is the link (inertial) frame.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
import jax.numpy as jnp

from ..maths import quaternion as quat
from .model import PhysicsModel
from .state import SimState, joint_omega


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FKResult:
    body_q: Any      # (...,NB,4) world orientation per body
    body_p: Any      # (...,NB,3) link-frame origin (joint anchor) world pos
    body_com: Any    # (...,NB,3) world COM position
    body_w: Any      # (...,NB,3) world angular velocity
    body_vcom: Any   # (...,NB,3) world COM linear velocity
    body_vo: Any     # (...,NB,3) world velocity of the link origin point
    dof_axis: Any    # (...,NV,3) world axis per dof
    dof_pos: Any     # (...,NV,3) world anchor per dof

    def tree_flatten(self):
        return (self.body_q, self.body_p, self.body_com, self.body_w,
                self.body_vcom, self.body_vo, self.dof_axis, self.dof_pos), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


_PALLAS_FK_CACHE = {}


def fk(model: PhysicsModel, state: SimState) -> FKResult:
    """Forward kinematics.  With params.use_pallas_fk, batched calls (incl.
    through vmap) are routed to the Pallas kernel (ops/fk_kernel.py) via a
    custom_vmap rule; unbatched calls and the default path use the XLA
    level-parallel sweep below."""
    if model.params.use_pallas_fk:
        key = id(model)
        if key not in _PALLAS_FK_CACHE:
            _PALLAS_FK_CACHE[key] = _make_pallas_dispatch(model)
        return _PALLAS_FK_CACHE[key](state)
    return _fk_xla(model, state)


def _make_pallas_dispatch(model: PhysicsModel):
    from jax import custom_batching

    @custom_batching.custom_vmap
    def _fk1(state):
        return _fk_xla(model, state)

    @_fk1.def_vmap
    def _fk_vmap_rule(axis_size, in_batched, state):
        from ..ops.fk_kernel import fk_pallas
        out = fk_pallas(model, state)
        out_batched = jax.tree.map(lambda _: True, out)
        return out, out_batched

    return _fk1


def _fk_xla(model: PhysicsModel, state: SimState) -> FKResult:
    J = model.num_joints
    batch = state.batch_shape
    om = joint_omega(model, state)          # (...,J,3)

    jpos = jnp.asarray(model.joint_pos)
    jquat = jnp.asarray(model.joint_quat)
    com_l = jnp.asarray(model.com)

    # Level-parallel tree sweep: all joints at the same depth share no
    # parent-child dependency, so each level is ONE batched block of
    # quaternion ops (7 levels for the loco character instead of 24
    # sequential per-joint dispatches).
    NB = J + 1
    body_q = jnp.zeros(batch + (NB, 4)).at[..., 0, :].set(state.root_q)
    body_p = jnp.zeros(batch + (NB, 3)).at[..., 0, :].set(state.root_p)
    body_w = jnp.zeros(batch + (NB, 3)).at[..., 0, :].set(state.root_w)
    body_vo = jnp.zeros(batch + (NB, 3)).at[..., 0, :].set(state.root_v)

    for level in model.levels:
        j = jnp.asarray(level)
        par = jnp.asarray(model.body_parent[level + 1])
        q_p = body_q[..., par, :]
        p_p = body_p[..., par, :]
        w_p = body_w[..., par, :]
        vo_p = body_vo[..., par, :]
        q_frame = quat.mul(q_p, jquat[j])
        p_j = p_p + quat.rotate(q_p, jpos[j])
        q_j = quat.mul(q_frame, state.joint_q[..., j, :])
        w_j = w_p + quat.rotate(q_j, om[..., j, :])
        vo_j = vo_p + jnp.cross(w_p, p_j - p_p)
        body_q = body_q.at[..., j + 1, :].set(q_j)
        body_p = body_p.at[..., j + 1, :].set(p_j)
        body_w = body_w.at[..., j + 1, :].set(w_j)
        body_vo = body_vo.at[..., j + 1, :].set(vo_j)

    r_com = quat.rotate(body_q, jnp.broadcast_to(com_l, batch + (J + 1, 3)))
    body_com = body_p + r_com
    body_vcom = body_vo + jnp.cross(body_w, r_com)

    # Per-dof world axes/anchors: one to_matrix + two static gathers instead
    # of a Python loop of stacks (cuts ~120 dispatched ops per substep).
    dof_body = jnp.asarray(model.dof_body)       # (NV,)
    dof_joint = np.asarray(model.dof_joint)
    axis_local = jnp.asarray(model.dof_axis_local,
                             dtype=body_q.dtype)  # (NV,3)
    R_bodies = quat.to_matrix(body_q)            # (...,NB,3,3)
    R_d = R_bodies[..., dof_body, :, :]          # (...,NV,3,3)
    axis_joint = jnp.einsum("...dij,dj->...di", R_d, axis_local)
    is_root_dof = jnp.asarray(dof_joint < 0)[:, None]
    dof_axis = jnp.where(is_root_dof, axis_local, axis_joint)
    dof_pos = body_p[..., dof_body, :]           # root dofs -> root_p

    return FKResult(
        body_q=body_q, body_p=body_p, body_com=body_com,
        body_w=body_w, body_vcom=body_vcom, body_vo=body_vo,
        dof_axis=dof_axis, dof_pos=dof_pos,
    )


def com_and_vel(model: PhysicsModel, k: FKResult):
    """Whole-body COM and COM velocity (reference
    bullet/bullet_utils.py:165-189)."""
    m = jnp.asarray(model.mass)
    total = model.total_mass
    com = jnp.sum(m[:, None] * k.body_com, axis=-2) / total
    vel = jnp.sum(m[:, None] * k.body_vcom, axis=-2) / total
    return com, vel


def contact_point_positions(model: PhysicsModel, k: FKResult):
    """World positions + velocities of the candidate contact points."""
    pb = jnp.asarray(model.point_body)
    pl = jnp.asarray(model.point_pos)
    q = k.body_q[..., pb, :]
    p = k.body_p[..., pb, :]
    w = k.body_w[..., pb, :]
    vo = k.body_vo[..., pb, :]
    r = quat.rotate(q, pl)
    x = p + r
    v = vo + jnp.cross(w, r)
    return x, v


def interaction_mesh_samples(model: PhysicsModel, k: FKResult, samples):
    """Interpolated joint-position samples (reference
    sim_agent.py:529-547: char_info.interaction_mesh_samples entries
    (j1, j2, alpha) -> lerp(p_j1, p_j2, alpha) in world space).

    samples: (S,3) array-like of (joint1, joint2, alpha); joint index -1 is
    the root.  Joint positions are the link-frame origins (joint anchors).
    Returns (...,S,3).
    """
    samples = np.asarray(samples, dtype=np.float64)
    j1_raw = samples[:, 0].astype(np.int32)
    j1 = jnp.asarray(j1_raw + 1)
    j2_raw = samples[:, 1].astype(np.int32)
    # j2 None is encoded as -2 (reference uses None -> p2 = p1)
    j2 = jnp.asarray(np.where(j2_raw == -2, j1_raw, j2_raw) + 1)
    alpha = jnp.asarray(samples[:, 2], dtype=jnp.float32)
    p1 = k.body_p[..., j1, :]
    p2 = k.body_p[..., j2, :]
    return (1.0 - alpha[:, None]) * p1 + alpha[:, None] * p2
