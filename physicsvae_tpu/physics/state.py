"""SimState: the explicit, batched simulation state pytree.

Replaces Bullet's hidden C++ world state + saveState/restoreState
(reference envs/env_humanoid_tracking.py:179, 424-431): here reset is just
pytree construction, free under vmap.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..maths import quaternion as quat
from .model import PhysicsModel


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SimState:
    root_p: Any    # (...,3)
    root_q: Any    # (...,4) xyzw
    joint_q: Any   # (...,J,4) local joint rotations (identity for fixed)
    vel: Any       # (...,NV) packed generalized velocity

    def tree_flatten(self):
        return (self.root_p, self.root_q, self.joint_q, self.vel), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def batch_shape(self):
        return self.root_p.shape[:-1]

    @property
    def root_v(self):
        return self.vel[..., 0:3]

    @property
    def root_w(self):
        return self.vel[..., 3:6]


def _movable_joints(model: PhysicsModel):
    import numpy as np
    return jnp.asarray(np.where(model.movable)[0])


def joint_omega(model: PhysicsModel, state: SimState):
    """(...,J,3) local angular velocity per joint (zeros for fixed).

    One static contraction against mov_dof_T: spherical joints recover
    their 3 axis components, revolute joints contribute axis * qdot.
    """
    J = model.num_joints
    batch = state.batch_shape
    T = jnp.asarray(model.mov_dof_T, dtype=state.vel.dtype)
    om_mov = jnp.einsum("...d,mdi->...mi", state.vel[..., 6:], T)
    out = jnp.zeros(batch + (J, 3), dtype=state.vel.dtype)
    return out.at[..., jnp.asarray(model.mov_joints), :].set(om_mov)


def set_joint_omega(model: PhysicsModel, vel, omega):
    """Scatter (...,J,3) local joint angular velocities into packed vel
    (per-dof projection onto the local dof axes — exact for spherical,
    axis projection for revolute)."""
    om_mov = omega[..., jnp.asarray(model.mov_joints), :]
    T = jnp.asarray(model.mov_dof_T, dtype=vel.dtype)
    return vel.at[..., 6:].set(jnp.einsum("...mi,mdi->...d", om_mov, T))


def default_state(model: PhysicsModel, batch_shape=()) -> SimState:
    return SimState(
        root_p=jnp.zeros(batch_shape + (3,)),
        root_q=quat.identity(batch_shape),
        joint_q=quat.identity(batch_shape + (model.num_joints,)),
        vel=jnp.zeros(batch_shape + (model.nv,)),
    )


def from_pose(model: PhysicsModel, root_p, root_q, joint_q,
              root_v=None, root_w=None, joint_w=None) -> SimState:
    """Build a SimState from a kinematic pose (+ optional velocities).

    Mirrors SimAgent.set_pose (reference sim_agent.py:393-447).
    """
    batch_shape = jnp.asarray(root_p).shape[:-1]
    vel = jnp.zeros(batch_shape + (model.nv,))
    if root_v is not None:
        vel = vel.at[..., 0:3].set(root_v)
    if root_w is not None:
        vel = vel.at[..., 3:6].set(root_w)
    if joint_w is not None:
        vel = set_joint_omega(model, vel, joint_w)
    return SimState(
        root_p=jnp.asarray(root_p),
        root_q=quat.normalize(jnp.asarray(root_q)),
        joint_q=quat.normalize(jnp.asarray(joint_q)),
        vel=vel,
    )
