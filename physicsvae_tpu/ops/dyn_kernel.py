"""Fused kinematics+dynamics-terms Pallas kernel (batch-on-lanes).

One kernel computes, entirely in VMEM with model constants baked in:
  FK (body q/p/w/vo/com/vcom)  +  spatial inertias I_sp (25x6x6)
  +  motion subspace S (60x6)  +  spatial velocities V (25x6)
  +  RNEA bias force c (60)    +  contact candidate positions x (NP x 3)

This replaces the ~200 dispatched elementwise ops of fk + dynamics_terms +
contact_point_positions per substep (the "loop fusion" tail of the r3
trace) with one program; the MXU matmuls (CRBA assembly, NS refinement,
Delassus, APGD) stay in XLA.  All quantities use the ROOT POSITION as
coordinate origin (dynamics.py convention: O(1 m) float32 lever arms).

Validated against the XLA path in interpret mode (tests/test_dyn_kernel.py)
— same formulas, same accumulation order per term, agreement to f32
rounding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

from .fk_kernel import (_add, _cross, _qmul, _qmul_const_right, _qrotate,
                        _qrotate_const, _round_up, _sub)


def _rot_mat(q):
    """Row-tuple quaternion -> 3x3 rotation entries R[a][b]."""
    x, y, z, w = q
    return (
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)),
    )


def _mat_const_vec(R, c):
    """R (row-tuple 3x3) @ constant python vec c."""
    cx, cy, cz = (float(v) for v in c)
    return tuple(R[a][0] * cx + R[a][1] * cy + R[a][2] * cz
                 for a in range(3))


def _make_kernel(model):
    J = model.num_joints
    NB = model.num_bodies
    NV = model.nv
    parent = np.asarray(model.body_parent)
    jpos = np.asarray(model.joint_pos)
    jquat = np.asarray(model.joint_quat)
    com_l = np.asarray(model.com)
    mass = np.asarray(model.mass, dtype=np.float64)
    I_l = np.asarray(model.inertia, dtype=np.float64)
    dof_body = np.asarray(model.dof_body)
    dof_joint = np.asarray(model.dof_joint)
    dof_axis_local = np.asarray(model.dof_axis_local, dtype=np.float64)
    dof_is_ang = np.asarray(model.dof_is_ang)
    joint_ndof = np.asarray(model.joint_ndof)
    joint_dof_start = np.asarray(model.joint_dof_start)
    point_body = np.asarray(model.point_body)
    point_pos = np.asarray(model.point_pos)
    gravity = float(model.params.gravity)
    g_vec = gravity * np.asarray(model.v_up_env, dtype=np.float64)

    # subtree children lists for the reverse (leaf-to-root) force sweep
    children = [[] for _ in range(NB)]
    for b in range(1, NB):
        children[int(parent[b])].append(b)

    def kernel(root_ref, jq_ref, om_ref, vel_ref,
               q_out, p_out, w_out, vo_out, com_out, vcom_out,
               S_out, I_out, V_out, c_out, x_out):
        def rows(ref, i, n):
            return tuple(ref[i + k, :] for k in range(n))

        # ---------------- FK (identical to fk_kernel) -----------------
        body_q = [rows(root_ref, 3, 4)]
        body_p = [rows(root_ref, 0, 3)]
        body_v = [rows(root_ref, 7, 3)]
        body_w = [rows(root_ref, 10, 3)]
        for j in range(J):
            par = int(parent[j + 1])
            q_p = body_q[par]
            q_frame = _qmul_const_right(q_p, jquat[j])
            r = _qrotate_const(q_p, jpos[j])
            p_j = _add(body_p[par], r)
            q_j = _qmul(q_frame, rows(jq_ref, 4 * j, 4))
            w_j = _add(body_w[par], _qrotate(q_j, rows(om_ref, 3 * j, 3)))
            vo_j = _add(body_v[par], _cross(body_w[par], r))
            body_q.append(q_j)
            body_p.append(p_j)
            body_w.append(w_j)
            body_v.append(vo_j)

        body_com, body_vcom, Rm = [], [], []
        for b in range(NB):
            R = _rot_mat(body_q[b])
            Rm.append(R)
            rc = _mat_const_vec(R, com_l[b])
            body_com.append(_add(body_p[b], rc))
            body_vcom.append(_add(body_v[b], _cross(body_w[b], rc)))

        origin = body_p[0]

        # ---------------- spatial inertia (dynamics.spatial_inertia) --
        # Ic = R I_l R^T; TL = Ic + m(|c|^2 I - c c^T); MC = m skew(c)
        I_sp = []  # per body: 6x6 as nested lists of rows
        for b in range(NB):
            R = Rm[b]
            m = float(mass[b])
            IR = [[sum(R[a][cc] * float(I_l[b, cc, d]) for cc in range(3))
                   for d in range(3)] for a in range(3)]
            Ic = [[sum(IR[a][d] * R[bb][d] for d in range(3))
                   for bb in range(3)] for a in range(3)]
            c0 = body_com[b][0] - origin[0]
            c1 = body_com[b][1] - origin[1]
            c2 = body_com[b][2] - origin[2]
            cs = (c0, c1, c2)
            cc2 = c0 * c0 + c1 * c1 + c2 * c2
            TL = [[Ic[a][bb] + m * ((cc2 if a == bb else 0.0)
                                    - cs[a] * cs[bb])
                   for bb in range(3)] for a in range(3)]
            SK = ((None, -c2, c1), (c2, None, -c0), (-c1, c0, None))
            MC = [[(m * SK[a][bb]) if SK[a][bb] is not None else None
                   for bb in range(3)] for a in range(3)]
            Isp = [[None] * 6 for _ in range(6)]
            for a in range(3):
                for bb in range(3):
                    Isp[a][bb] = TL[a][bb]
                    Isp[a][3 + bb] = MC[a][bb]
                    Isp[3 + a][bb] = (-MC[a][bb]) if MC[a][bb] is not None \
                        else None
                    Isp[3 + a][3 + bb] = m if a == bb else None
            I_sp.append(Isp)

        # ---------------- spatial velocity V ---------------------------
        V = []
        for b in range(NB):
            rel = _sub(body_com[b], origin)
            vlin = _add(body_vcom[b], _cross(rel, body_w[b]))
            V.append(body_w[b] + vlin)          # 6-tuple of rows

        # ---------------- motion subspace S ----------------------------
        S = []
        for d in range(NV):
            jd = int(dof_joint[d])
            if jd < 0:
                ax = dof_axis_local[d]
                if dof_is_ang[d]:
                    # root angular dof anchored at origin: lever arm 0
                    S.append(tuple(float(v) for v in ax) + (0.0, 0.0, 0.0))
                else:
                    S.append((0.0, 0.0, 0.0) + tuple(float(v) for v in ax))
            else:
                b = int(dof_body[d])
                ax = _mat_const_vec(Rm[b], dof_axis_local[d])
                rel = _sub(body_p[b], origin)
                lin = _cross(rel, ax)
                S.append(ax + lin)

        # ---------------- RNEA bias c ----------------------------------
        # A0 = (0, -g + pdot x omega); vJ per movable body; root-to-leaf
        # acceleration; f = I A + V x* (I V); reverse subtree sums;
        # c_d = S_d . F_{body(d)}  (same formulas as dynamics.bias_force)
        pdot = rows(root_ref, 7, 3)
        omega = rows(root_ref, 10, 3)
        pxw = _cross(pdot, omega)
        A = [None] * NB
        A[0] = (0.0, 0.0, 0.0,
                pxw[0] - float(g_vec[0]), pxw[1] - float(g_vec[1]),
                pxw[2] - float(g_vec[2]))

        def crm(v, u):
            w_, vo = v[:3], v[3:]
            uw, uv = u[:3], u[3:]
            top = _cross(w_, uw)
            bot = _add(_cross(w_, uv), _cross(vo, uw))
            return top + bot

        def crf(v, f):
            w_, vo = v[:3], v[3:]
            n_, fl = f[:3], f[3:]
            top = _add(_cross(w_, n_), _cross(vo, fl))
            bot = _cross(w_, fl)
            return top + bot

        def mat6vec(Isp, u):
            out = []
            for a in range(6):
                acc = None
                for bb in range(6):
                    e = Isp[a][bb]
                    if e is None:
                        continue
                    term = e * u[bb] if not isinstance(e, float) \
                        else (e * u[bb])
                    acc = term if acc is None else acc + term
                out.append(acc if acc is not None else u[0] * 0.0)
            return tuple(out)

        order = []  # root-to-leaf body order
        stack = [0]
        while stack:
            b = stack.pop()
            order.append(b)
            stack.extend(children[b])
        for b in order:
            if b == 0:
                continue
            j = b - 1
            s0 = int(joint_dof_start[j])
            nd = int(joint_ndof[j])
            if nd > 0:
                vJ = None
                for dd in range(s0, s0 + nd):
                    term = tuple(S[dd][i] * vel_ref[dd, :] if not
                                 isinstance(S[dd][i], float)
                                 else S[dd][i] * vel_ref[dd, :]
                                 for i in range(6))
                    vJ = term if vJ is None else _add(vJ, term)
                A[b] = _add(A[int(parent[b])], crm(V[b], vJ))
            else:
                A[b] = A[int(parent[b])]

        f = []
        for b in range(NB):
            IV = mat6vec(I_sp[b], V[b])
            IA = mat6vec(I_sp[b], A[b])
            f.append(_add(IA, crf(V[b], IV)))
        F = [None] * NB
        for b in reversed(order):
            Fb = f[b]
            for cch in children[b]:
                Fb = _add(Fb, F[cch])
            F[b] = Fb

        # ---------------- contact candidate points --------------------
        NP_ = point_body.shape[0]
        for pidx in range(NP_):
            b = int(point_body[pidx])
            xp = _add(body_p[b], _mat_const_vec(Rm[b], point_pos[pidx]))
            for i in range(3):
                x_out[3 * pidx + i, :] = xp[i]

        # ---------------- writes ---------------------------------------
        for b in range(NB):
            for k in range(4):
                q_out[4 * b + k, :] = body_q[b][k]
            for k in range(3):
                p_out[3 * b + k, :] = body_p[b][k]
                w_out[3 * b + k, :] = body_w[b][k]
                vo_out[3 * b + k, :] = body_v[b][k]
                com_out[3 * b + k, :] = body_com[b][k]
                vcom_out[3 * b + k, :] = body_vcom[b][k]
            for a in range(6):
                V_out[6 * b + a, :] = V[b][a]
                for bb in range(6):
                    e = I_sp[b][a][bb]
                    if e is None:
                        e = body_p[0][0] * 0.0
                    elif isinstance(e, float):
                        e = body_p[0][0] * 0.0 + e
                    I_out[36 * b + 6 * a + bb, :] = e
        zero = body_p[0][0] * 0.0
        for d in range(NV):
            for i in range(6):
                e = S[d][i]
                S_out[6 * d + i, :] = (zero + e) if isinstance(e, float) \
                    else e
            b = int(dof_body[d]) if int(dof_joint[d]) >= 0 else 0
            acc = None
            for i in range(6):
                sd = S[d][i]
                if isinstance(sd, float):
                    if sd == 0.0:
                        continue
                    term = sd * F[b][i]
                else:
                    term = sd * F[b][i]
                acc = term if acc is None else acc + term
            c_out[d, :] = acc if acc is not None else zero

    return kernel


_CACHE = {}


def dynamics_fused_fm(model, root13, jq, om, vel, interpret=False):
    """Feature-major entry: root13 (13,B), jq (4J,B), om (3J,B), vel (NV,B).

    Returns (q, p, w, vo, com, vcom, S, I, V, c, x) feature-major."""
    NB = model.num_bodies
    J = model.num_joints
    NV = model.nv
    NP_ = model.point_body.shape[0]
    B = root13.shape[-1]
    Bt = min(256, _round_up(B, 128))
    Bp = _round_up(B, Bt)
    if Bp != B:
        pad = lambda x: jnp.pad(x, ((0, 0), (0, Bp - B)))
        root13, jq, om, vel = (pad(v) for v in (root13, jq, om, vel))

    key = id(model)
    if key not in _CACHE:
        _CACHE[key] = _make_kernel(model)
    kernel = _CACHE[key]

    def spec(rowsn):
        return pl.BlockSpec((rowsn, Bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out_rows = [4 * NB, 3 * NB, 3 * NB, 3 * NB, 3 * NB, 3 * NB,
                6 * NV, 36 * NB, 6 * NB, NV, 3 * NP_]
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // Bt,),
        in_specs=[spec(13), spec(4 * J), spec(3 * J), spec(NV)],
        out_specs=[spec(r) for r in out_rows],
        out_shape=[jax.ShapeDtypeStruct((r, Bp), jnp.float32)
                   for r in out_rows],
        interpret=interpret,
    )(root13, jq, om, vel)
    return tuple(o[:, :B] for o in outs)


def dynamics_terms_fused(model, state, interpret=False):
    """Drop-in for (fk, dynamics_terms, contact_point_positions):

    returns (FKResult, S (B,NV,6), I_sp (B,NB,6,6), V (B,NB,6), c (B,NV),
    x (B,NP,3)).  Batched states only."""
    from ..physics.fk import FKResult
    from ..physics.state import joint_omega

    assert state.root_p.ndim == 2, "fused dynamics expects a batched state"
    B = state.root_p.shape[0]
    J = model.num_joints
    NB = model.num_bodies
    NV = model.nv
    NP_ = model.point_body.shape[0]

    om = joint_omega(model, state)
    root13 = jnp.concatenate(
        [state.root_p, state.root_q, state.vel[:, 0:3], state.vel[:, 3:6]],
        axis=-1).T
    jq = state.joint_q.reshape(B, 4 * J).T
    omf = om.reshape(B, 3 * J).T
    velf = state.vel.T

    (q, p, w, vo, com, vcom, S, I, V, c, x) = dynamics_fused_fm(
        model, root13, jq, omf, velf, interpret)

    body_q = q.T.reshape(B, NB, 4)
    body_p = p.T.reshape(B, NB, 3)

    # per-dof tables (same as fk)
    from ..maths import quaternion as quat
    dof_body = jnp.asarray(model.dof_body)
    dof_joint = np.asarray(model.dof_joint)
    axis_local = jnp.asarray(model.dof_axis_local, dtype=body_q.dtype)
    R_bodies = quat.to_matrix(body_q)
    R_d = R_bodies[..., dof_body, :, :]
    axis_joint = jnp.einsum("...dij,dj->...di", R_d, axis_local)
    is_root_dof = jnp.asarray(dof_joint < 0)[:, None]
    dof_axis = jnp.where(is_root_dof, axis_local, axis_joint)
    dof_pos = body_p[..., dof_body, :]

    k = FKResult(
        body_q=body_q, body_p=body_p,
        body_com=com.T.reshape(B, NB, 3),
        body_w=w.T.reshape(B, NB, 3),
        body_vcom=vcom.T.reshape(B, NB, 3),
        body_vo=vo.T.reshape(B, NB, 3),
        dof_axis=dof_axis, dof_pos=dof_pos)
    return (k, S.T.reshape(B, NV, 6), I.T.reshape(B, NB, 6, 6),
            V.T.reshape(B, NB, 6), c.T.reshape(B, NV),
            x.T.reshape(B, NP_, 3))
