"""Multi-agent scenes: N characters in ONE physical world.

Reference: envs/env_humanoid_tracking.py:181-209 spawns num_agent SimAgents
into the same Bullet world, so characters physically interact through the
common contact solver.  TPU design: per-agent dynamics stay the vmapped
single-agent code (block-diagonal mass matrix — agents only couple through
contacts), and inter-agent capsule-capsule contacts add impulse rows whose
Jacobians span BOTH agents' velocity spaces:

    A = sum_a J_a M_a^{-1} J_a^T      (Delassus over the agent blocks)
    dv_a = M_a^{-1} J_a^T lambda

Ground contacts and self-collision are handled inside the per-agent substep
as usual; this module adds the cross-agent narrow phase + coupled solve on
top of the per-agent velocity predictions.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..maths import quaternion as quat
from . import contacts as contacts_mod
from .fk import fk
from .model import PhysicsModel
from .state import SimState


class AgentPairContacts(NamedTuple):
    pos: jnp.ndarray      # (...,K,3) world contact point
    normal: jnp.ndarray   # (...,K,3) pushes agent i away from agent j
    depth: jnp.ndarray    # (...,K)
    body_i: jnp.ndarray   # (...,K) body on agent i
    body_j: jnp.ndarray   # (...,K) body on agent j


def _world_capsules(model: PhysicsModel, k_fk):
    wa = k_fk.body_p + quat.rotate(k_fk.body_q, jnp.asarray(model.cap_a))
    wb = k_fk.body_p + quat.rotate(k_fk.body_q, jnp.asarray(model.cap_b))
    return wa, wb


def detect_agent_contacts(model: PhysicsModel, k_i, k_j, num_contacts: int):
    """Deepest-K capsule contacts between two agents (all NB x NB body
    pairs, same capsule approximation as self-collision)."""
    from .self_collision import segment_closest_points

    NB = model.num_bodies
    wa_i, wb_i = _world_capsules(model, k_i)
    wa_j, wb_j = _world_capsules(model, k_j)
    r = jnp.asarray(model.cap_r)

    bi = jnp.repeat(jnp.arange(NB), NB)
    bj = jnp.tile(jnp.arange(NB), NB)
    x1, x2 = segment_closest_points(
        wa_i[..., bi, :], wb_i[..., bi, :],
        wa_j[..., bj, :], wb_j[..., bj, :])
    d = x1 - x2
    dist = jnp.linalg.norm(d, axis=-1)
    depth = r[bi] + r[bj] - dist
    normal = d / jnp.maximum(dist[..., None], 1e-8)
    pos = 0.5 * (x1 + x2)

    from .linalg import onehot_take, topk_argmax

    dd, idx = topk_argmax(depth, num_contacts)
    feats = jnp.concatenate([pos, normal], axis=-1)
    sel = onehot_take(feats, idx)
    return AgentPairContacts(
        pos=sel[..., 0:3], normal=sel[..., 3:6], depth=dd,
        body_i=bi[idx], body_j=bj[idx])


def _point_jacobian(model: PhysicsModel, k_fk, pos, body, sign):
    """J: (...,K,3,NV) of the contact points on one agent's bodies."""
    cons = contacts_mod.Contacts(
        pos=pos, depth=jnp.zeros(pos.shape[:-1]),
        active=jnp.ones(pos.shape[:-1], bool), body=body,
        point_idx=jnp.zeros_like(body))
    return sign * contacts_mod.contact_jacobian(model, k_fk, cons)


def solve_agent_contacts(model: PhysicsModel, Minv_i, Minv_j, k_i, k_j,
                         v_i, v_j, con: AgentPairContacts, dt):
    """Coupled impulse solve for one agent pair.

    Returns (dv_i, dv_j).  Same APGD cone QP as ground contacts, with the
    Delassus operator summed over the two agent blocks."""
    p = model.params
    K = con.depth.shape[-1]
    nv = model.nv
    batch = v_i.shape[:-1]
    f32 = v_i.dtype
    bf16 = p.matmul_bf16

    def mm(sub, a, b):
        if bf16:
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        return jnp.einsum(sub, a, b, preferred_element_type=f32)

    # relative contact-point velocity Jacobian: J = J_i - J_j
    J_i = _point_jacobian(model, k_i, con.pos, con.body_i, 1.0)
    J_j = _point_jacobian(model, k_j, con.pos, con.body_j, 1.0)
    Ji = J_i.reshape(batch + (K * 3, nv))
    Jj = J_j.reshape(batch + (K * 3, nv))

    W_i = mm("...ij,...kj->...ik", Minv_i, Ji)           # (...,nv,3K)
    W_j = mm("...ij,...kj->...ik", Minv_j, Jj)
    A = (mm("...ik,...kj->...ij", Ji, W_i)
         + mm("...ik,...kj->...ij", Jj, W_j))            # (...,3K,3K)

    n = con.normal
    vc = (jnp.einsum("...kin,...n->...ki", J_i, v_i)
          - jnp.einsum("...kin,...n->...ki", J_j, v_j))
    bias = -p.baumgarte / dt * jnp.maximum(
        con.depth - p.contact_slop, 0.0)
    b = vc + bias[..., None] * n
    act = (con.depth > 0.0).astype(f32)

    ref = jnp.where(jnp.abs(n[..., 0:1]) < 0.9,
                    jnp.asarray([1.0, 0.0, 0.0], f32),
                    jnp.asarray([0.0, 1.0, 0.0], f32))
    t2 = jnp.cross(n, ref)
    t2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-8)
    t1 = jnp.cross(t2, n)
    mu = p.mu * p.mu  # char-char: Bullet multiplies both bodies' mu

    def project(li):
        ln = jnp.maximum(jnp.einsum("...ki,...ki->...k", li, n), 0.0)
        lt1 = jnp.einsum("...ki,...ki->...k", li, t1)
        lt2 = jnp.einsum("...ki,...ki->...k", li, t2)
        lt = jnp.sqrt(lt1 ** 2 + lt2 ** 2 + 1e-12)
        scale = jnp.minimum(1.0, mu * ln / jnp.maximum(lt, 1e-9))
        li = (ln[..., None] * n + (scale * lt1)[..., None] * t1
              + (scale * lt2)[..., None] * t2)
        return li * act[..., None]

    Lb = jnp.max(jnp.sum(jnp.abs(A), axis=-1), axis=-1)
    inv_L = 1.0 / jnp.maximum(Lb, 1e-8)
    A_mv = A.astype(jnp.bfloat16) if bf16 else A

    def mv(lam):
        lam = lam.reshape(batch + (K * 3,))
        if bf16:
            lam = lam.astype(jnp.bfloat16)
        return jnp.einsum("...ij,...j->...i", A_mv, lam,
                          preferred_element_type=f32
                          ).reshape(batch + (K, 3))

    def apgd(carry, _):
        lam, y, t = carry
        g = b + mv(y)
        lam_new = project(y - inv_L[..., None, None] * g)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = lam_new + ((t - 1.0) / t_new) * (lam_new - lam)
        return (lam_new, y_new, t_new), None

    lam0 = jnp.zeros(batch + (K, 3), f32)
    (lam, _, _), _ = jax.lax.scan(
        apgd, (lam0, lam0, jnp.asarray(1.0, f32)), None,
        length=p.apgd_iters)

    lam_f = lam.reshape(batch + (K * 3,))
    dv_i = mm("...nk,...k->...n", W_i, lam_f)
    dv_j = -mm("...nk,...k->...n", W_j, lam_f)
    return dv_i, dv_j


def scene_step(model: PhysicsModel, states: SimState, actions,
               ground_height=0.0, num_agent_contacts: int = 8):
    """One control step of an N-agent scene.

    states/actions carry a leading agent axis (N, ...).  Each substep:
    per-agent dynamics + SPD + ground/self contacts (the vmapped
    single-agent substep), then the inter-agent coupled contact solve for
    every agent pair — the TPU equivalent of all characters living in one
    stepSimulation world (envs/env_humanoid_tracking.py:181-209, :375-413).
    """
    from . import step as step_mod

    N = states.root_p.shape[0]
    pairs = [(i, j) for i in range(N) for j in range(i + 1, N)]
    p = model.params
    dt = p.dt_sim

    def one_substep(sts, Minvs):
        """sts: agent-stacked SimState (N,...); Minvs: None (first substep,
        exact factorization) or (N,...,NV,NV) warm-start inverses."""
        new_states, new_Minvs = [], []
        for a in range(N):
            st_a = jax.tree.map(lambda x: x[a], sts)
            act_a = jax.tree.map(lambda x: x[a], actions)
            Mi = None if Minvs is None else Minvs[a]
            st2, Mi2, _, _ = step_mod.substep(model, st_a, act_a, Mi,
                                              ground_height)
            new_states.append(st2)
            new_Minvs.append(Mi2.astype(jnp.float32))

        # inter-agent coupling on the post-substep velocities
        ks = [fk(model, s) for s in new_states]
        vels = [s.vel for s in new_states]
        for (i, j) in pairs:
            con = detect_agent_contacts(model, ks[i], ks[j],
                                        num_agent_contacts)
            dv_i, dv_j = solve_agent_contacts(
                model, new_Minvs[i], new_Minvs[j], ks[i], ks[j],
                vels[i], vels[j], con, dt)
            vels[i] = vels[i] + dv_i
            vels[j] = vels[j] + dv_j
        new_states = [
            SimState(s.root_p, s.root_q, s.joint_q, v)
            for s, v in zip(new_states, vels)]

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *new_states)
        return stacked, jnp.stack(new_Minvs)

    sts, Minvs = one_substep(states, None)

    def body(carry, _):
        sts, Minvs = carry
        sts, Minvs = one_substep(sts, Minvs)
        return (sts, Minvs), None

    (sts, _), _ = jax.lax.scan(body, (sts, Minvs), None,
                               length=p.num_substeps - 1)
    return sts
