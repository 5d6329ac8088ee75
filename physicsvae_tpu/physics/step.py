"""Simulation stepping: stable-PD actuation fused into the implicit solve,
contact impulses, semi-implicit Euler integration, control-step substepping.

Replaces the reference hot loop `num_substep x {actuate; stepSimulation}`
(envs/env_humanoid_tracking.py:375-413) and Bullet's STABLE_PD_CONTROL
(sim_agent.py:694-703).  Stable PD follows Tan et al.: the damping term is
implicit — (M + dt*Kd) qdd = tau_ext - c - kp*err(q + dt qdot, q_target)
- kd*qdot — which is what makes kp=500 stable at 480 Hz.

TPU design note: all solves use an explicit inverse of the damped mass
matrix, computed exactly once per control step and kept current across the
16 substeps by Newton–Schulz refinement (see physics/linalg.py) — the
factorization-free path keeps the whole substep on the MXU/VPU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..maths import quaternion as quat
from . import contacts as contacts_mod
from .dynamics import dynamics_terms
from .fk import contact_point_positions, fk
from .linalg import ns_refine, spd_inverse
from .model import PhysicsModel
from .state import SimState, joint_omega


class Action(NamedTuple):
    """Per-control-step actuation targets (already denormalized).

    target_q: (...,J,4) target local joint rotations (identity for fixed).
    target_w: (...,J,3) target local joint velocities.
    root_force / root_torque: optional residual root wrench (world frame).
    torque: optional (...,NV) direct torques (TQ actuation mode).
    """
    target_q: jnp.ndarray
    target_w: jnp.ndarray
    root_force: Optional[jnp.ndarray] = None
    root_torque: Optional[jnp.ndarray] = None
    torque: Optional[jnp.ndarray] = None


def hold_action(model: PhysicsModel, batch_shape=()) -> Action:
    return Action(
        target_q=quat.identity(batch_shape + (model.num_joints,)),
        target_w=jnp.zeros(batch_shape + (model.num_joints, 3)),
    )


def spd_torque(model: PhysicsModel, state: SimState, action: Action, dt):
    """Per-dof stable-PD torque (before the implicit damping solve).

    tau = -kp * err(q advanced by dt*qdot, q_target) - kd * qdot, clamped to
    per-dof max_force (Bullet clamps motor forces the same way,
    sim_agent.py:166-172).
    """
    kp = jnp.asarray(model.kp)
    kd = jnp.asarray(model.kd)
    max_f = jnp.asarray(model.max_force)
    damping = jnp.asarray(model.damping)
    mov = jnp.asarray(np.where(model.movable)[0])

    om = joint_omega(model, state)                       # (...,J,3)
    q_adv = quat.integrate(state.joint_q, om, dt)
    # error rotation from advanced pose to target, in the child joint frame
    err = quat.to_axis_angle(quat.mul(quat.conjugate(q_adv), action.target_q))

    # Movable-joint dofs are contiguous after the 6 root dofs, in joint order.
    t_mov = (err[..., mov, :] * kp[6:].reshape(-1, 3)
             + (action.target_w[..., mov, :] - om[..., mov, :])
             * kd[6:].reshape(-1, 3))
    batch = state.vel.shape[:-1]
    tau = jnp.concatenate(
        [jnp.zeros(batch + (6,)), t_mov.reshape(batch + (-1,))], axis=-1)
    tau = jnp.clip(tau, -max_f, max_f)
    # URDF joint damping applied explicitly
    tau = tau - damping * state.vel
    if action.root_force is not None:
        tau = tau.at[..., 0:3].add(action.root_force)
    if action.root_torque is not None:
        tau = tau.at[..., 3:6].add(action.root_torque)
    if action.torque is not None:
        tau = tau + action.torque
    return tau


def _damped_mass_matrix(model: PhysicsModel, M, dt):
    kd_diag = jnp.asarray(model.kd) + jnp.asarray(model.damping)
    return M + dt * jnp.diag(kd_diag)


def substep(model: PhysicsModel, state: SimState, action: Action,
            Minv=None, ground_height=0.0):
    """One physics substep at dt_sim (480 Hz for the loco config).

    Minv: warm-start inverse of the damped mass matrix from the previous
    substep; None -> exact factorization.  Returns (state, Minv).
    """
    p = model.params
    dt = p.dt_sim

    k = fk(model, state)
    S, M, c = dynamics_terms(model, state, k)
    M_hat = _damped_mass_matrix(model, M, dt)
    if Minv is None:
        Minv = spd_inverse(M_hat)
    else:
        Minv = ns_refine(M_hat, Minv, iters=p.ns_iters)

    tau = spd_torque(model, state, action, dt)
    qdd = jnp.einsum("...ij,...j->...i", Minv, tau - c)
    v_pred = state.vel + dt * qdd

    # Contacts on the predicted velocity
    x, _ = contact_point_positions(model, k)
    depth = contacts_mod.detect_ground(model, x, ground_height)
    cons = contacts_mod.select_contacts(model, x, depth)
    J = contacts_mod.contact_jacobian(model, k, cons)
    normals = jnp.broadcast_to(jnp.asarray(model.v_up_env, J.dtype),
                               cons.depth.shape + (3,))
    mu = jnp.full(cons.depth.shape, p.mu)
    if p.self_collision and model.self_pairs.shape[0] > 0:
        # capsule-capsule self contacts join the same impulse solve
        from .self_collision import detect_self_contacts, pair_jacobian
        sp, sn, sd, bi, bj = detect_self_contacts(model, k)
        Js = pair_jacobian(model, k, sp, bi, bj)
        J = jnp.concatenate([J, Js], axis=-3)
        normals = jnp.concatenate([normals, sn], axis=-2)
        cons = contacts_mod.Contacts(
            pos=jnp.concatenate([cons.pos, sp], axis=-2),
            depth=jnp.concatenate([cons.depth, sd], axis=-1),
            active=jnp.concatenate([cons.active, sd > 0.0], axis=-1),
            body=jnp.concatenate([cons.body, bi], axis=-1),
            point_idx=jnp.concatenate(
                [cons.point_idx, -jnp.ones_like(bi)], axis=-1),
        )
        # Bullet combines friction multiplicatively: char-char = mu^2
        mu = jnp.concatenate(
            [mu, jnp.full(sd.shape, p.mu * p.mu)], axis=-1)
    dv, _ = contacts_mod.solve_contacts(model, Minv, J, v_pred, cons, dt,
                                        normals, mu)
    vel = v_pred + dv

    # Semi-implicit Euler integration
    om = joint_omega(model, SimState(state.root_p, state.root_q,
                                     state.joint_q, vel))
    new_state = SimState(
        root_p=state.root_p + dt * vel[..., 0:3],
        root_q=quat.integrate_world(state.root_q, vel[..., 3:6], dt),
        joint_q=quat.integrate(state.joint_q, om, dt),
        vel=vel,
    )
    return new_state, Minv


def control_step(model: PhysicsModel, state: SimState, action: Action,
                 ground_height=0.0) -> SimState:
    """One control step = num_substeps physics substeps under lax.scan
    (mirrors envs/env_humanoid_tracking.py:393-399).

    The first substep factorizes the damped mass matrix exactly; the
    remaining substeps refine the inverse (Newton–Schulz warm start).
    """
    state, Minv = substep(model, state, action, None, ground_height)

    def body(carry, _):
        st, Mi = carry
        st, Mi = substep(model, st, action, Mi, ground_height)
        return (st, Mi), None

    (state, _), _ = jax.lax.scan(
        body, (state, Minv), None, length=model.params.num_substeps - 1)
    return state


def check_ground_contact(model: PhysicsModel, state: SimState,
                         ground_height=0.0, margin=0.0):
    """(disallowed_contact, any_contact) booleans per batch element.

    Used for falldown-by-collision (envs/env_humanoid_tracking.py:278-288).
    """
    k = fk(model, state)
    x, _ = contact_point_positions(model, k)
    depth = contacts_mod.detect_ground(model, x, ground_height)
    touching = depth > -margin
    allow = jnp.asarray(model.point_allow)
    disallowed = jnp.any(touching & ~allow, axis=-1)
    return disallowed, jnp.any(touching, axis=-1)
