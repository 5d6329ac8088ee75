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

    from .linalg import topk_rank

    dd, idx, oh = topk_rank(depth, num_contacts)
    feats = jnp.concatenate([pos, normal], axis=-1)
    sel = jnp.einsum("...kp,...pf->...kf", oh, feats)
    bi_s = jnp.einsum("...kp,p->...k", oh,
                      bi.astype(jnp.float32)).astype(jnp.int32)
    bj_s = jnp.einsum("...kp,p->...k", oh,
                      bj.astype(jnp.float32)).astype(jnp.int32)
    return AgentPairContacts(
        pos=sel[..., 0:3], normal=sel[..., 3:6], depth=dd,
        body_i=bi_s, body_j=bj_s)


def _point_jacobian(model: PhysicsModel, k_fk, pos, body, sign):
    """J: (...,K,3,NV) of the contact points on one agent's bodies."""
    cons = contacts_mod.Contacts(
        pos=pos, depth=jnp.zeros(pos.shape[:-1]),
        active=jnp.ones(pos.shape[:-1], bool), body=body,
        point_idx=jnp.zeros_like(body))
    return sign * contacts_mod.contact_jacobian(model, k_fk, cons)


def solve_agent_contacts(model: PhysicsModel, Minv_i, Minv_j, k_i, k_j,
                         v_i, v_j, con: AgentPairContacts, dt,
                         lam_warm=None):
    """Coupled impulse solve for one agent pair.

    Returns (dv_i, dv_j, lam).  Same APGD cone QP as ground contacts, with
    the Delassus operator summed over the two agent blocks; lam warm-starts
    the next substep (impulses are equal-and-opposite through W_i/W_j, so
    scene momentum is conserved exactly up to matmul precision)."""
    p = model.params
    K = con.depth.shape[-1]
    nv = model.nv
    batch = v_i.shape[:-1]
    f32 = v_i.dtype
    # full f32 here: bf16 W_i/W_j rounding is independent per agent, which
    # injects ~2% phantom momentum per collision (momentum conservation
    # test); the pair solve is O(pairs), not the hot path.
    bf16 = False

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

    if lam_warm is None:
        lam0 = jnp.zeros(batch + (K, 3), f32)
        iters = p.apgd_iters
    else:
        lam0 = project(lam_warm)
        iters = p.apgd_warm_iters
    (lam, _, _), _ = jax.lax.scan(
        apgd, (lam0, lam0, jnp.asarray(1.0, f32)), None,
        length=iters)

    lam_f = lam.reshape(batch + (K * 3,))
    dv_i = mm("...nk,...k->...n", W_i, lam_f)
    dv_j = -mm("...nk,...k->...n", W_j, lam_f)
    return dv_i, dv_j, lam


def scene_step(model: PhysicsModel, states: SimState, actions,
               ground_height=0.0, num_agent_contacts: int = 8,
               obstacles=None):
    """One control step of an N-agent scene.

    states/actions carry a leading agent axis (N, ...).  Each substep:

      1. vmapped per-agent presolve (dynamics + actuation -> v_pred),
      2. per-agent ground/self contact solve on v_pred,
      3. inter-agent coupled contact solve on v_pred for every pair (ONE
         vmapped batched APGD over the stacked pair axis, warm-started
         across substeps),
      4. a single integration with the summed velocity change.

    Inter-agent impulses act BEFORE positions integrate, so there is no
    one-substep lag and momentum between agents is conserved exactly (the
    r2 "phantom momentum" artifact).  Obstacles couple to every agent
    against one shared pool (reference: one world,
    envs/env_humanoid_tracking.py:181-209, :375-413).
    """
    from . import step as step_mod
    from . import obstacles as obstacles_mod

    N = states.root_p.shape[0]
    pairs = np.asarray([(i, j) for i in range(N) for j in range(i + 1, N)],
                       dtype=np.int32)
    pi = jnp.asarray(pairs[:, 0])
    pj = jnp.asarray(pairs[:, 1])
    p = model.params
    dt = p.dt_sim

    def presolve_cold(st, act):
        k, Mi, v_pred, _, _, sc, _ = step_mod.substep_presolve(
            model, st, act, None, ground_height, want_sel=False)
        return k, Mi.astype(jnp.float32), v_pred, sc

    def presolve_warm(st, act, Mi):
        # f32 refinement: scene momentum error scales with inverse-residual
        # x collision impulse, so scenes keep the inverse at ~1e-4 resid
        # (bf16's 4e-3 floor would show up as per-collision momentum drift)
        k, Mi, v_pred, _, _, sc, _ = step_mod.substep_presolve(
            model, st, act, Mi, ground_height,
            refine_iters=2, refine_bf16=False, want_sel=False)
        return k, Mi, v_pred, sc

    def one_substep(sts, Minvs, lam_g, lam_p, pool):
        if Minvs is None:
            k, Minv, v_pred, sc = jax.vmap(presolve_cold)(sts, actions)
        else:
            k, Minv, v_pred, sc = jax.vmap(presolve_warm)(sts, actions,
                                                          Minvs)

        # shared obstacle pool vs every agent: per-agent impulse exchange,
        # pool reaction accumulated over agents
        if pool is not None:
            def obs_one(k_a, v_a, Mi_a):
                return obstacles_mod.impulses_on_character(
                    model, pool, k_a, v_a, Mi_a, dt)
            import dataclasses as _dc
            dv_obs, pools = jax.vmap(obs_one)(k, v_pred, Minv)
            v_pred = v_pred + dv_obs
            # accumulate every agent's reaction on the shared obstacles
            dvel = (pools.vel - pool.vel[None]).sum(0)
            pool = _dc.replace(pool, vel=pool.vel + dvel)
            gvec = p.gravity * jnp.asarray(model.v_up_env)
            pool = obstacles_mod.update(pool, dt, gvec,
                                        v_up=model.v_up_env,
                                        ground_height=ground_height)

        # per-agent ground + self contacts on v_pred
        def ground_one(k_a, Mi_a, v_a, lw, sc_a):
            return step_mod.solve_ground_self(model, k_a, Mi_a, v_a,
                                              ground_height, lw,
                                              sc_feats=sc_a)
        if lam_g is None:
            dv_g, lam_g = jax.vmap(
                lambda k_a, Mi_a, v_a, sc_a: ground_one(k_a, Mi_a, v_a,
                                                        None, sc_a)
            )(k, Minv, v_pred, sc)
        else:
            dv_g, lam_g = jax.vmap(ground_one)(k, Minv, v_pred, lam_g, sc)

        # inter-agent contacts: stack all pairs, one vmapped coupled solve
        k_i = jax.tree.map(lambda x: x[pi], k)
        k_j = jax.tree.map(lambda x: x[pj], k)
        con = jax.vmap(lambda a, b: detect_agent_contacts(
            model, a, b, num_agent_contacts))(k_i, k_j)

        def pair_one(Mi, Mj, ka, kb, vi, vj, c, lw):
            return solve_agent_contacts(model, Mi, Mj, ka, kb, vi, vj, c,
                                        dt, lam_warm=lw)
        if lam_p is None:
            dv_i, dv_j, lam_p = jax.vmap(
                lambda Mi, Mj, ka, kb, vi, vj, c:
                pair_one(Mi, Mj, ka, kb, vi, vj, c, None)
            )(Minv[pi], Minv[pj], k_i, k_j, v_pred[pi], v_pred[pj], con)
        else:
            dv_i, dv_j, lam_p = jax.vmap(pair_one)(
                Minv[pi], Minv[pj], k_i, k_j, v_pred[pi], v_pred[pj], con,
                lam_p)
        dv_pair = (jnp.zeros_like(v_pred).at[pi].add(dv_i)
                   .at[pj].add(dv_j))

        vel = v_pred + dv_g + dv_pair
        sts = jax.vmap(lambda s, v: step_mod.integrate(model, s, v, dt))(
            sts, vel)
        return sts, Minv, lam_g, lam_p, pool

    sts, Minvs, lam_g, lam_p, pool = one_substep(states, None, None, None,
                                                 obstacles)

    def body(carry, _):
        sts, Minvs, lam_g, lam_p, pool = carry
        return one_substep(sts, Minvs, lam_g, lam_p, pool), None

    (sts, _, _, _, pool), _ = jax.lax.scan(
        body, (sts, Minvs, lam_g, lam_p, pool), None,
        length=p.num_substeps - 1)
    if obstacles is None:
        return sts
    return sts, pool
