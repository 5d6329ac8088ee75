"""Self-collision: capped pair list + capsule-capsule narrow phase.

Re-build of Bullet's URDF_USE_SELF_COLLISION path (sim_agent.py:67-86): the
character collides with itself, except parent-child links (Bullet default)
and the char-info collision-ignore pairs.  TPU design (SURVEY.md §7 hard part
3): every link is approximated by one capsule (its dominant collision geom),
the static pair list is precomputed on the host, and each substep evaluates
all pair distances in parallel and feeds the deepest K2 into the same APGD
impulse solve as ground contacts, with per-contact normals.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..maths import quaternion as quat
from .model import PhysicsModel
from ..kinematics.urdf import GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE


def build_capsules(cm):
    """Per-body capsule approximation (a, b endpoints in link frame, radius)
    from each link's largest collision geom.  Boxes become capsules along
    their longest axis with the mean of the other half-extents as radius."""
    NB = cm.num_joints + 1
    a = np.zeros((NB, 3))
    b = np.zeros((NB, 3))
    r = np.zeros(NB)

    best_vol = np.full(NB, -1.0)
    for g in range(cm.geom_link.shape[0]):
        body = int(cm.geom_link[g]) + 1
        t = int(cm.geom_type[g])
        size = cm.geom_size[g]
        pos = cm.geom_pos[g]
        import jax.numpy as _j
        R = np.asarray(quat.to_matrix(_j.asarray(cm.geom_quat[g])))
        if t == GEOM_SPHERE:
            vol = size[0] ** 3
            ca, cb, cr = pos, pos, size[0]
        elif t == GEOM_CAPSULE:
            vol = size[0] ** 2 * (size[0] + size[1])
            axis = R @ np.array([0.0, 0.0, 1.0])
            ca, cb, cr = pos - size[1] * axis, pos + size[1] * axis, size[0]
        elif t == GEOM_BOX:
            vol = size[0] * size[1] * size[2]
            k = int(np.argmax(size))
            axis = R @ np.eye(3)[k]
            others = [size[i] for i in range(3) if i != k]
            cr = float(np.mean(others))
            hl = max(size[k] - cr, 0.0)
            ca, cb = pos - hl * axis, pos + hl * axis
        else:
            continue
        if vol > best_vol[body]:
            best_vol[body] = vol
            a[body], b[body], r[body] = ca, cb, cr
    return a, b, r


def build_pair_list_raw(body_parent, ignore_pairs):
    """Candidate link pairs: all (i<j) body pairs except parent-child
    (Bullet filters them without URDF_USE_SELF_COLLISION_INCLUDE_PARENT) and
    char-info ignore pairs (link indices, loco_char_info.py:378-394)."""
    NB = len(body_parent)
    ignore = {tuple(sorted((int(i) + 1, int(j) + 1)))
              for i, j in np.asarray(ignore_pairs).reshape(-1, 2)}
    pairs = []
    for i in range(NB):
        for j in range(i + 1, NB):
            if body_parent[j] == i or body_parent[i] == j:
                continue
            if tuple(sorted((i, j))) in ignore:
                continue
            pairs.append((i, j))
    return np.asarray(pairs, dtype=np.int32)


def segment_closest_points(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2] (batched,
    branchless clamped version of Ericson's algorithm)."""
    d1 = q1 - p1
    d2 = q2 - p2
    rvec = p1 - p2
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * rvec, axis=-1)
    c = jnp.sum(d1 * rvec, axis=-1)
    bq = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - bq * bq
    s = jnp.where(denom > 1e-12, (bq * f - c * e) / jnp.maximum(denom, 1e-12),
                  0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(e > 1e-12, (bq * s + f) / jnp.maximum(e, 1e-12), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    # recompute s for clamped t
    s = jnp.where(e > 1e-12,
                  jnp.clip((bq * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0),
                  s)
    x1 = p1 + s[..., None] * d1
    x2 = p2 + t_cl[..., None] * d2
    return x1, x2


def self_pair_features(model: PhysicsModel, k_fk):
    """Narrow phase over the full static pair list: returns
    (pos (...,P,3), normal (...,P,3), depth (...,P)).  Split from the
    selection so the fused dynamics kernel (ops/dyn_kernel.py) can
    produce these features in VMEM — the per-pair chain materialized
    ~150 MB/substep of intermediates in XLA (r4 trace)."""
    pairs = jnp.asarray(model.self_pairs)
    cap_a = jnp.asarray(model.cap_a)
    cap_b = jnp.asarray(model.cap_b)
    cap_r = jnp.asarray(model.cap_r)
    bi = pairs[:, 0]
    bj = pairs[:, 1]

    # World capsule endpoints PER BODY (NB=25), then two coalesced
    # per-pair gathers — not per-pair rotations (the old path rotated 4x263
    # vectors; 10x the flops and 4 tiny-minor-dim gathers).
    wa = k_fk.body_p + quat.rotate(k_fk.body_q, cap_a)
    wb = k_fk.body_p + quat.rotate(k_fk.body_q, cap_b)
    ab = jnp.concatenate([wa, wb], axis=-1)              # (...,NB,6)
    fi = ab[..., bi, :]
    fj = ab[..., bj, :]
    a1, b1 = fi[..., 0:3], fi[..., 3:6]
    a2, b2 = fj[..., 0:3], fj[..., 3:6]

    x1, x2 = segment_closest_points(a1, b1, a2, b2)
    d = x1 - x2
    dist = jnp.linalg.norm(d, axis=-1)
    depth = cap_r[bi] + cap_r[bj] - dist
    normal = d / jnp.maximum(dist[..., None], 1e-8)
    pos = 0.5 * (x1 + x2)
    return pos, normal, depth


def select_self_contacts(model: PhysicsModel, pos, normal, depth):
    """Deepest K2 of the pair features (ranking-matmul top-K + coalesced
    one-hot gathers).  Returns (pos, normal, depth, body_i, body_j)."""
    sel, _ = select_self_contacts_oh(model, pos, normal, depth)
    return sel[:5]


def select_self_contacts_oh(model: PhysicsModel, pos, normal, depth):
    """select_self_contacts that also returns the (...,K2,P) selection
    one-hot — the held-contact cadence reuses it to refresh the held pairs'
    depths from the fused kernel's per-pair narrow phase each warm
    substep."""
    bi = jnp.asarray(model.self_pairs)[:, 0]
    bj = jnp.asarray(model.self_pairs)[:, 1]

    from .linalg import topk_rank_2stage

    K2 = model.params.num_self_contacts
    dd, idx, oh = topk_rank_2stage(depth, K2)

    # ONE coalesced one-hot-matmul gather of all per-pair features instead
    # of separate vec3 take_along_axis calls (tiny-minor-dim gathers
    # dominated the self-collision cost in the r2 device trace); the
    # ranking one-hot doubles as the gather matrix.
    feats = jnp.concatenate([pos, normal], axis=-1)      # (...,P,6)
    sel = jnp.einsum("...kp,...pf->...kf", oh, feats)
    bi_s = jnp.einsum("...kp,p->...k", oh,
                      bi.astype(jnp.float32)).astype(jnp.int32)
    bj_s = jnp.einsum("...kp,p->...k", oh,
                      bj.astype(jnp.float32)).astype(jnp.int32)
    return (sel[..., 0:3], sel[..., 3:6], dd, bi_s, bj_s, idx), oh


def select_self_contacts_fm(model: PhysicsModel, sc_fm):
    """Feature-major top-K2 self-collision selection straight off the
    fused dynamics kernel's (7P, B) narrow-phase rows ([dist; pos xyz;
    normal xyz] per static pair, batch on lanes) — the (B,P,·) batch-major
    unpack transposes 30 MB/substep at B=2048 (r4 trace copy of
    f32[2048,7,263]); selecting in feature-major transposes only the K2
    chosen rows.  Identical selections/gathers as select_self_contacts_oh.

    Returns contacts.SelfSel in feature-major form: pos/normal (K2,3,B),
    depth (K2,B), body_i/body_j (K2,B) int32."""
    from .contacts import SelfSel
    from .linalg import topk_rank_2stage_fm

    pairs = np.asarray(model.self_pairs)
    P_ = pairs.shape[0]
    B = sc_fm.shape[-1]
    cap_r = np.asarray(model.cap_r)
    rsum = jnp.asarray((cap_r[pairs[:, 0]]
                        + cap_r[pairs[:, 1]]).astype(np.float32))
    m = sc_fm.reshape(7, P_, B)
    depth = rsum[:, None] - m[0]                          # (P,B)

    K2 = model.params.num_self_contacts
    dd, idx, oh = topk_rank_2stage_fm(depth, K2)          # (K2,B)/(K2,P,B)
    feats = m[1:7]                                        # (6,P,B)
    sel = jnp.sum(oh[:, None, :, :] * feats[None], axis=2)  # (K2,6,B)
    bi_f = jnp.asarray(pairs[:, 0], jnp.float32)[None, :, None]
    bj_f = jnp.asarray(pairs[:, 1], jnp.float32)[None, :, None]
    bi_s = jnp.sum(oh * bi_f, axis=1).astype(jnp.int32)   # (K2,B)
    bj_s = jnp.sum(oh * bj_f, axis=1).astype(jnp.int32)
    return SelfSel(pos=sel[:, 0:3], normal=sel[:, 3:6], depth=dd,
                   body_i=bi_s, body_j=bj_s, pair_idx=idx)


def detect_self_contacts(model: PhysicsModel, k_fk):
    """Deepest K2 self-collision candidates (narrow phase + selection).

    Returns (pos, normal, depth, body_i, body_j); depth > 0 = overlapping;
    normal pushes body_i away from body_j."""
    pos, normal, depth = self_pair_features(model, k_fk)
    return select_self_contacts(model, pos, normal, depth)


def pair_jacobian(model: PhysicsModel, k_fk, pos, body_i, body_j):
    """Relative point Jacobian J_i - J_j at the contact points:
    (...,K2,3,NV)."""
    axis = k_fk.dof_axis
    anchor = k_fk.dof_pos
    is_ang = jnp.asarray(model.dof_is_ang)
    anc = jnp.asarray(model.anc)

    # Row-major assembly (see contacts.contact_jacobian): the 3 world rows
    # are built as (...,K2,NV) planes and stacked on axis -2, so the
    # Jacobian is born (...,K2,3,NV) with no swapaxes relayout.
    ax, ay, az = (axis[..., None, :, 0], axis[..., None, :, 1],
                  axis[..., None, :, 2])                     # (...,1,NV)
    rx = pos[..., :, 0:1] - anchor[..., None, :, 0]          # (...,K2,NV)
    ry = pos[..., :, 1:2] - anchor[..., None, :, 1]
    rz = pos[..., :, 2:3] - anchor[..., None, :, 2]
    J0 = jnp.where(is_ang, ay * rz - az * ry, jnp.broadcast_to(ax, rx.shape))
    J1 = jnp.where(is_ang, az * rx - ax * rz, jnp.broadcast_to(ay, rx.shape))
    J2 = jnp.where(is_ang, ax * ry - ay * rx, jnp.broadcast_to(az, rx.shape))
    f32 = J0.dtype
    mask = anc[body_i].astype(f32) - anc[body_j].astype(f32)
    return jnp.stack([J0, J1, J2], axis=-2) * mask[..., None, :]
