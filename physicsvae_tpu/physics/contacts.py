"""Ground-contact detection and impulse solve.

TPU-native replacement for Bullet's narrow phase + sequential-impulse LCP
(reference solver params at envs/env_humanoid_tracking.py:241-250: 10 solver
iterations, cone friction).  Design (SURVEY.md §7 Phase 1):

  - A fixed set of candidate points (sphere centers, capsule endpoints, box
    corners) is tested against the ground plane/heightmap every substep.
  - The deepest K candidates form a fixed-size contact buffer (shape-static
    for vmap); inactive slots are masked.
  - Impulses are solved with projected Gauss–Seidel on the Delassus operator
    A = J M^-1 J^T with a friction cone |λ_t| <= mu λ_n, Baumgarte
    stabilization, zero restitution (loco char_info restitution = 0).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .model import PhysicsModel


class Contacts(NamedTuple):
    pos: jnp.ndarray      # (...,K,3) world contact point
    depth: jnp.ndarray    # (...,K) penetration depth (>0 means penetrating)
    active: jnp.ndarray   # (...,K) bool
    body: jnp.ndarray     # (...,K) int body index
    point_idx: jnp.ndarray  # (...,K) candidate index


def detect_ground(model: PhysicsModel, x, ground_height=0.0):
    """Penetration depth of every candidate point vs the ground plane.

    x: (...,NP,3) world candidate positions.  Returns (...,NP) depth
    (positive = penetrating), using the env up-axis.
    """
    up = jnp.asarray(model.v_up_env, dtype=x.dtype)
    h = jnp.einsum("...i,i->...", x, up) - ground_height
    return jnp.asarray(model.point_radius) - h


def select_contacts(model: PhysicsModel, x, depth, margin=0.0):
    """Top-K deepest candidates as a fixed-size contact set."""
    K = model.params.num_contacts
    d, idx = jax.lax.top_k(depth, K)
    active = d > -margin
    pos = jnp.take_along_axis(x, idx[..., None], axis=-2)
    body = jnp.asarray(model.point_body)[idx]
    return Contacts(pos=pos, depth=d, active=active, body=body, point_idx=idx)


def contact_jacobian(model: PhysicsModel, k_fk, contacts: Contacts):
    """J: (...,K,3,NV) mapping generalized velocity -> world velocity of each
    contact point (rows: world x,y,z)."""
    axis = k_fk.dof_axis            # (...,NV,3)
    anchor = k_fk.dof_pos           # (...,NV,3)
    is_ang = jnp.asarray(model.dof_is_ang)
    anc = jnp.asarray(model.anc)    # (NB,NV)

    x = contacts.pos[..., :, None, :]          # (...,K,1,3)
    r = x - anchor[..., None, :, :]            # (...,K,NV,3)
    Jang = jnp.cross(axis[..., None, :, :], r)  # a_d x (x - p_d)
    Jlin = jnp.broadcast_to(axis[..., None, :, :], Jang.shape)
    Jcols = jnp.where(is_ang[:, None], Jang, Jlin)  # (...,K,NV,3)
    mask = anc[contacts.body]                  # (...,K,NV)
    Jcols = Jcols * mask[..., None]
    return jnp.swapaxes(Jcols, -1, -2)         # (...,K,3,NV)


def solve_contacts(model: PhysicsModel, M_chol, J, v_pred, contacts: Contacts,
                   dt):
    """Projected Gauss–Seidel impulse solve.

    M_chol: cholesky factor of the (damped) mass matrix, (...,NV,NV).
    J: (...,K,3,NV).  v_pred: (...,NV) post-force velocity.
    Returns (delta_v (...,NV), impulses (...,K,3)).
    """
    p = model.params
    K = p.num_contacts
    nv = model.nv
    batch = v_pred.shape[:-1]

    Jf = J.reshape(batch + (K * 3, nv))
    # W = M^-1 J^T via the prefactored cholesky
    W = jax.scipy.linalg.cho_solve((M_chol, True),
                                   jnp.swapaxes(Jf, -1, -2))  # (...,nv,3K)
    A = jnp.einsum("...ik,...kj->...ij", Jf, W)               # (...,3K,3K)
    A = A.reshape(batch + (K, 3, K, 3))

    up = jnp.asarray(model.v_up_env, dtype=v_pred.dtype)
    vc = jnp.einsum("...kin,...n->...ki", J, v_pred)          # (...,K,3)

    # Desired normal velocity: Baumgarte push-out, no restitution.
    bias = -p.baumgarte / dt * jnp.maximum(contacts.depth - p.contact_slop, 0.0)
    b = vc + bias[..., None] * up                              # (...,K,3)

    act = contacts.active.astype(v_pred.dtype)

    # Tangent basis in the ground plane (up = y for loco).
    t1 = jnp.asarray([1.0, 0.0, 0.0], dtype=v_pred.dtype)
    t2 = jnp.cross(up, t1)
    t1 = jnp.cross(t2, up)

    def pgs_iter(lam, _):
        def body(i, lam):
            # residual velocity at contact i given current impulses
            Ai = jax.lax.dynamic_index_in_dim(A, i, axis=A.ndim - 4,
                                              keepdims=False)  # (...,3,K,3)
            vi = b[..., i, :] + jnp.einsum("...njm,...jm->...n", Ai, lam)
            Aii = jax.lax.dynamic_index_in_dim(Ai, i, axis=Ai.ndim - 2,
                                               keepdims=False)  # (...,3,3)
            # local solve: lam_i -= Aii^-1 vi, then project to cone
            dli = jnp.linalg.solve(Aii, vi)
            li = lam[..., i, :] - dli
            ln = jnp.einsum("...i,i->...", li, up)
            ln = jnp.maximum(ln, 0.0)
            lt1 = jnp.einsum("...i,i->...", li, t1)
            lt2 = jnp.einsum("...i,i->...", li, t2)
            lt = jnp.sqrt(lt1 ** 2 + lt2 ** 2 + 1e-12)
            scale = jnp.minimum(1.0, p.mu * ln / jnp.maximum(lt, 1e-9))
            li = ln[..., None] * up + scale[..., None] * (
                lt1[..., None] * t1 + lt2[..., None] * t2)
            li = li * act[..., i, None]
            return lam.at[..., i, :].set(li)

        lam = jax.lax.fori_loop(0, K, body, lam)
        return lam, None

    lam0 = jnp.zeros(batch + (K, 3), dtype=v_pred.dtype)
    lam, _ = jax.lax.scan(pgs_iter, lam0, None, length=p.solver_iters)

    imp = jnp.einsum("...kin,...ki->...n", J, lam)             # (...,nv)
    delta_v = jax.scipy.linalg.cho_solve((M_chol, True), imp[..., None])[..., 0]
    return delta_v, lam
