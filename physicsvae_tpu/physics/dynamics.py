"""Batched rigid-body dynamics: mass matrix (CRBA) and bias forces (RNEA).

TPU-native replacement for Bullet's Featherstone solver core (reference
`stepSimulation`, envs/env_humanoid_tracking.py:399).  All quantities are in
world-origin Plücker coordinates so that everything batches into dense
einsums that map onto the MXU; per-body recursions are short static loops
(tree depth ~7 for the loco character).

Spatial vector convention: motion v = (omega, v_O) where v_O is the velocity
of the body-fixed point coincident with the world origin; force f = (n_O, f).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..maths import quaternion as quat
from .fk import FKResult
from .model import PhysicsModel
from .state import SimState


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def motion_subspace(model: PhysicsModel, k: FKResult, origin):
    """S: (...,NV,6) Plücker motion subspace columns.

    Angular dof about axis a through point p: (a, p × a); linear dof: (0, e).
    Coordinates are taken about `origin` (the root position) rather than the
    world origin to keep lever arms small in float32.
    """
    is_ang = jnp.asarray(model.dof_is_ang)[:, None]
    rel = k.dof_pos - origin[..., None, :]
    ang = jnp.where(is_ang, k.dof_axis, 0.0)
    lin = jnp.where(is_ang, jnp.cross(rel, k.dof_axis), k.dof_axis)
    return jnp.concatenate([ang, lin], axis=-1)


def spatial_inertia(model: PhysicsModel, k: FKResult, origin):
    """I: (...,NB,6,6) spatial inertia of each body about `origin`."""
    m = jnp.asarray(model.mass)                       # (NB,)
    R = quat.to_matrix(k.body_q)                      # (...,NB,3,3)
    I_l = jnp.asarray(model.inertia)                  # (NB,3,3)
    I_c = jnp.einsum("...kij,kjl,...kml->...kim", R, I_l, R)
    cx = _skew(k.body_com - origin[..., None, :])     # (...,NB,3,3)
    mcx = m[:, None, None] * cx
    top_left = I_c + jnp.einsum("...kij,...klj->...kil", mcx, cx)  # Ic + m cx cx^T
    eye = jnp.broadcast_to(jnp.eye(3), cx.shape)
    bottom_right = m[:, None, None] * eye
    top = jnp.concatenate([top_left, mcx], axis=-1)
    bottom = jnp.concatenate([-mcx, bottom_right], axis=-1)  # m cx^T = -m cx
    return jnp.concatenate([top, bottom], axis=-2)


def spatial_velocity(k: FKResult, origin):
    """V: (...,NB,6) body spatial velocities in `origin` coordinates."""
    v_o = k.body_vcom + jnp.cross(k.body_com - origin[..., None, :], k.body_w)
    return jnp.concatenate([k.body_w, v_o], axis=-1)


def _crm(v, u):
    """Motion cross product v x u for 6-vectors."""
    w, vo = v[..., :3], v[..., 3:]
    uw, uv = u[..., :3], u[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, uw), jnp.cross(w, uv) + jnp.cross(vo, uw)], axis=-1)


def _crf(v, f):
    """Force cross product v x* f."""
    w, vo = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vo, fl), jnp.cross(w, fl)], axis=-1)


def mass_matrix(model: PhysicsModel, S, I_sp):
    """Composite-rigid-body mass matrix, (...,NV,NV).

    M[d,e] = S_e · (I^C_{body(d)} S_d) for e an ancestor-or-self dof of d.
    """
    NB = model.num_bodies
    # Composite inertias: leaf-to-root accumulation, one scatter-add per
    # tree level (duplicate parent indices within a level accumulate
    # correctly through at[].add).
    Ic = I_sp
    for level in reversed(model.levels):
        bodies = jnp.asarray(level) + 1
        par = jnp.asarray(model.body_parent[level + 1])
        Ic = Ic.at[..., par, :, :].add(Ic[..., bodies, :, :])

    Ic_d = Ic[..., jnp.asarray(model.dof_body), :, :]  # (...,NV,6,6)
    F = jnp.einsum("...dij,...dj->...di", Ic_d, S)     # (...,NV,6)
    Mfull = jnp.einsum("...di,...ei->...de", F, S)     # (...,NV,NV)
    W = jnp.asarray(model.anc_pair)                    # strict: e anc of d, e<d
    Ml = jnp.where(W, Mfull, 0.0)
    diag = jnp.where(jnp.eye(model.nv, dtype=bool), Mfull, 0.0)
    return Ml + jnp.swapaxes(Ml, -1, -2) + diag


def bias_force(model: PhysicsModel, k: FKResult, S, I_sp, V, vel):
    """c(q,v) = C(q,v)v + g(q): generalized bias forces, (...,NV).

    RNEA with qdd = 0 and the gravity trick (base acceleration = -g).
    """
    NB = model.num_bodies
    g = model.params.gravity * jnp.asarray(model.v_up_env, dtype=S.dtype)
    # Base spatial acceleration at qdd=0.  The gravity trick contributes
    # (0, -g).  The base's generalized velocity is (pdot, omega) at the moving
    # root anchor, so its angular motion subspace S = (e, p x e) has
    # Sdot*qdot = (0, pdot x omega) even at qdd = 0 — a floating-base term
    # Bullet's Featherstone handles implicitly.
    batch = k.body_q.shape[:-2]
    pdot = vel[..., 0:3]
    omega = vel[..., 3:6]
    lin0 = jnp.broadcast_to(-g, batch + (3,)) + jnp.cross(pdot, omega)
    A0 = jnp.concatenate([jnp.zeros(batch + (3,)), lin0], axis=-1)

    # Joint-velocity spatial contributions vJ per body (movable joints'
    # dofs are contiguous after the 6 root dofs, in joint order).
    import numpy as np
    mov_bodies = jnp.asarray(np.where(model.movable)[0] + 1)
    S_mov = S[..., 6:, :].reshape(S.shape[:-2] + (-1, 3, 6))
    v_mov = vel[..., 6:].reshape(vel.shape[:-1] + (-1, 3))
    vJ_mov = jnp.einsum("...jdi,...jd->...ji", S_mov, v_mov)
    vJ = jnp.zeros(batch + (NB, 6), dtype=S.dtype)
    vJ = vJ.at[..., mov_bodies, :].set(vJ_mov)

    # Root-to-leaf acceleration propagation, one level at a time.
    A = jnp.zeros(batch + (NB, 6), dtype=S.dtype).at[..., 0, :].set(A0)
    for level in model.levels:
        bodies = jnp.asarray(level) + 1
        par = jnp.asarray(model.body_parent[level + 1])
        Ab = A[..., par, :] + _crm(V[..., bodies, :], vJ[..., bodies, :])
        A = A.at[..., bodies, :].set(Ab)

    IV = jnp.einsum("...kij,...kj->...ki", I_sp, V)
    f = jnp.einsum("...kij,...kj->...ki", I_sp, A) + _crf(V, IV)

    anc = jnp.asarray(model.anc, dtype=S.dtype)        # (NB,NV)
    return jnp.einsum("...di,...ki,kd->...d", S, f, anc)


def dynamics_terms(model: PhysicsModel, state: SimState, k: FKResult):
    """Convenience: (S, M, c) for the current configuration.

    All spatial quantities use the root position as coordinate origin, so the
    generalized coordinates are unchanged but float32 lever arms stay O(1 m)
    regardless of where the character is in the world.
    """
    origin = state.root_p
    S = motion_subspace(model, k, origin)
    I_sp = spatial_inertia(model, k, origin)
    V = spatial_velocity(k, origin)
    M = mass_matrix(model, S, I_sp)
    c = bias_force(model, k, S, I_sp, V, state.vel)
    return S, M, c
