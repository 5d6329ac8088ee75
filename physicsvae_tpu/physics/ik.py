"""Damped-least-squares inverse kinematics.

Replaces Bullet's calculateInverseKinematics2 (sim_agent.py:549-564, a debug
utility in the reference): given target world positions for end-effector
links, iteratively solve for joint rotations.  Pure JAX; batched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..maths import quaternion as quat
from .fk import fk
from .model import PhysicsModel
from .state import SimState


def _ee_jacobian(model: PhysicsModel, k, ee_bodies):
    """Position Jacobian of each end-effector COM w.r.t. all dofs:
    (...,E,3,NV)."""
    axis = k.dof_axis
    anchor = k.dof_pos
    is_ang = jnp.asarray(model.dof_is_ang)
    anc = jnp.asarray(model.anc)

    x = k.body_com[..., ee_bodies, :]              # (...,E,3)
    r = x[..., :, None, :] - anchor[..., None, :, :]
    Jang = jnp.cross(axis[..., None, :, :], r)
    Jlin = jnp.broadcast_to(axis[..., None, :, :], Jang.shape)
    Jcols = jnp.where(is_ang[:, None], Jang, Jlin)
    mask = anc[ee_bodies]                          # (E,NV)
    Jcols = Jcols * mask[..., :, :, None]
    return jnp.swapaxes(Jcols, -1, -2)


def solve_ik(model: PhysicsModel, state: SimState, ee_bodies, targets,
             iterations: int = 20, damping: float = 1e-3,
             step_scale: float = 1.0, lock_root: bool = True) -> SimState:
    """Iterate dq = J^T (J J^T + λI)^-1 err toward the target positions.

    ee_bodies: (E,) body indices (e.g. model.end_effectors);
    targets: (...,E,3) world positions.  Returns a state with updated joint
    rotations (velocities untouched).
    """
    ee_bodies = jnp.asarray(ee_bodies)
    E = ee_bodies.shape[0]

    def body(st, _):
        k = fk(model, st)
        err = targets - k.body_com[..., ee_bodies, :]     # (...,E,3)
        J = _ee_jacobian(model, k, ee_bodies)             # (...,E,3,NV)
        Jf = J.reshape(J.shape[:-3] + (E * 3, model.nv))
        if lock_root:
            Jf = Jf.at[..., :, :6].set(0.0)
        e = err.reshape(err.shape[:-2] + (E * 3,))
        JJt = jnp.einsum("...in,...jn->...ij", Jf, Jf)
        JJt = JJt + damping * jnp.eye(E * 3)
        lam = jnp.linalg.solve(JJt, e[..., None])[..., 0]
        dq = step_scale * jnp.einsum("...in,...i->...n", Jf, lam)

        # integrate dq into the configuration (mov_dof_T maps dof deltas to
        # joint-space rotation vectors: 3 components spherical, axis*delta
        # revolute)
        mov = jnp.asarray(model.mov_joints)
        T = jnp.asarray(model.mov_dof_T, dtype=dq.dtype)
        om = jnp.einsum("...d,mdi->...mi", dq[..., 6:], T)
        joint_q = st.joint_q
        joint_q = joint_q.at[..., mov, :].set(
            quat.integrate(joint_q[..., mov, :], om, 1.0))
        root_p = st.root_p if lock_root else st.root_p + dq[..., 0:3]
        root_q = st.root_q if lock_root else \
            quat.integrate_world(st.root_q, dq[..., 3:6], 1.0)
        return SimState(root_p, root_q, joint_q, st.vel), None

    st, _ = jax.lax.scan(body, state, None, length=iterations)
    return st
