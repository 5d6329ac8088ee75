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
    """I: (...,NB,6,6) spatial inertia of each body about `origin`.

    Fully unrolled component arithmetic — every term is an elementwise op
    over (..., NB), assembled by ONE stack at the end.  The einsum/skew
    formulation relayouts (...,NB,3,3) tensors repeatedly (minor dims of 3
    waste 125/128 TPU lanes per op); this section profiled ~11% of the
    substep before the rewrite (r2 device trace, dynamics.py:25/51-54).
    """
    import numpy as np

    m = jnp.asarray(model.mass)                       # (NB,)
    x = k.body_q[..., 0]
    y = k.body_q[..., 1]
    z = k.body_q[..., 2]
    w = k.body_q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    R = ((r00, r01, r02), (r10, r11, r12), (r20, r21, r22))

    I_l = np.asarray(model.inertia)                   # (NB,3,3) host consts
    # Ic = R I_l R^T, unrolled (I_l rows enter as per-body constants)
    IR = [[sum(R[a][c] * I_l[:, c, d] for c in range(3)) for d in range(3)]
          for a in range(3)]
    Ic = [[sum(IR[a][d] * R[b][d] for d in range(3)) for b in range(3)]
          for a in range(3)]

    c = k.body_com - origin[..., None, :]
    c0, c1, c2 = c[..., 0], c[..., 1], c[..., 2]
    cs = (c0, c1, c2)
    cc = c0 * c0 + c1 * c1 + c2 * c2
    zero = jnp.zeros_like(c0 + m)

    # top-left = Ic + m*(|c|^2 I - c c^T)   (= Ic + m cx cx^T)
    TL = [[Ic[a][b] + m * ((cc if a == b else 0.0) - cs[a] * cs[b])
           for b in range(3)] for a in range(3)]
    # mcx = m * skew(c)
    SK = ((zero, -c2, c1), (c2, zero, -c0), (-c1, c0, zero))
    MC = [[m * SK[a][b] for b in range(3)] for a in range(3)]
    # bottom-right = m * I3
    BR = [[m + zero if a == b else zero for b in range(3)]
          for a in range(3)]

    rows = []
    for a in range(3):
        rows += [TL[a][0], TL[a][1], TL[a][2], MC[a][0], MC[a][1], MC[a][2]]
    for a in range(3):
        rows += [-MC[a][0], -MC[a][1], -MC[a][2], BR[a][0], BR[a][1], BR[a][2]]
    flat = jnp.stack([jnp.broadcast_to(r, zero.shape) for r in rows],
                     axis=-1)
    return flat.reshape(flat.shape[:-1] + (6, 6))


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
    # NOT bf16-gated: M must be precision-consistent with the f32 bias
    # force or free-fall picks up O(5 rad/s^2) phantom accelerations
    # (qdd = M^-1(tau - c) amplifies any M-vs-c mismatch).  Measured:
    # bf16 here fails test_free_fall_acceleration by 3 orders.
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

    # Joint-velocity spatial contributions vJ per body: sum S_d * v_d over
    # each movable joint's dofs (1 for revolute, 3 for spherical) — one
    # static membership contraction.
    import numpy as np
    mov_bodies = jnp.asarray(np.asarray(model.mov_joints) + 1)
    member = jnp.asarray(
        np.abs(model.mov_dof_T).sum(-1) > 0, dtype=S.dtype)  # (n_mov,NVm)
    Sv = S[..., 6:, :] * vel[..., 6:, None]
    vJ_mov = jnp.einsum("...di,md->...mi", Sv, member)
    vJ = jnp.zeros(batch + (NB, 6), dtype=S.dtype)
    vJ = vJ.at[..., mov_bodies, :].set(vJ_mov)

    # Root-to-leaf acceleration propagation, one level at a time.
    A = jnp.zeros(batch + (NB, 6), dtype=S.dtype).at[..., 0, :].set(A0)
    for level in model.levels:
        bodies = jnp.asarray(level) + 1
        par = jnp.asarray(model.body_parent[level + 1])
        Ab = A[..., par, :] + _crm(V[..., bodies, :], vJ[..., bodies, :])
        A = A.at[..., bodies, :].set(Ab)

    # NOTE: these stay f32 — bf16 here breaks extreme mass ratios (a 1e6-kg
    # quasi-static base rounds to ~4e3 absolute force error and injects
    # energy; caught by test_pendulum_energy_conserved).
    IV = jnp.einsum("...kij,...kj->...ki", I_sp, V)
    f = jnp.einsum("...kij,...kj->...ki", I_sp, A) + _crf(V, IV)

    anc = jnp.asarray(model.anc, dtype=S.dtype)        # (NB,NV)
    return jnp.einsum("...di,...ki,kd->...d", S, f, anc)


def dynamics_terms_split(model: PhysicsModel, state: SimState, k: FKResult):
    """(S, I_sp, V, c) — the per-body/per-dof elementwise terms, without
    the CRBA assembly (mass_matrix composes them on the MXU).  This split
    is the XLA fallback of the fused Pallas kernel (ops/dyn_kernel.py)."""
    origin = state.root_p
    S = motion_subspace(model, k, origin)
    I_sp = spatial_inertia(model, k, origin)
    V = spatial_velocity(k, origin)
    c = bias_force(model, k, S, I_sp, V, state.vel)
    return S, I_sp, V, c


def dynamics_terms(model: PhysicsModel, state: SimState, k: FKResult):
    """Convenience: (S, M, c) for the current configuration.

    All spatial quantities use the root position as coordinate origin, so the
    generalized coordinates are unchanged but float32 lever arms stay O(1 m)
    regardless of where the character is in the world.
    """
    S, I_sp, V, c = dynamics_terms_split(model, state, k)
    M = mass_matrix(model, S, I_sp)
    return S, M, c
