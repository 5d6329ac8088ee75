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


def _qconj(q):
    x, y, z, w = q
    return (-x, -y, -z, w)


def _qnormalize(q):
    x, y, z, w = q
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z + w * w, 1e-16))
    return (x * inv, y * inv, z * inv, w * inv)


def _q_from_axis_angle(a):
    """Row-tuple version of quaternion.from_axis_angle (sinc-safe)."""
    ax, ay, az = a
    angle = jnp.sqrt(ax * ax + ay * ay + az * az)
    half = 0.5 * angle
    k = jnp.where(angle > 1e-8, jnp.sin(half) / jnp.maximum(angle, 1e-8),
                  0.5)
    return (ax * k, ay * k, az * k, jnp.cos(half))


# Odd-polynomial asin(t) = t*P(t^2) on [0, 1/sqrt(2)], max abs err ~2e-7
# rad in f32 (least-squares fit on Chebyshev nodes; see docs/PERF_r4.md).
# Mosaic has no atan2/asin/acos lowering, so the axis-angle extraction
# below branches asin(s) vs pi/2-asin(w) — both args stay in [0,1/sqrt2]
# where the polynomial is well-conditioned.
_ASIN_COEFFS = (
    0.999999999868055, 0.16666674149893076, 0.0749947216955138,
    0.04478040384633793, 0.02860867305871449, 0.03520486287460474,
    -0.03764952586365863, 0.1540006479953988, -0.1881586096785944,
    0.1398153055385661)


def _asin_core(t):
    t2 = t * t
    p = _ASIN_COEFFS[-1]
    for c in _ASIN_COEFFS[-2::-1]:
        p = p * t2 + c
    return t * p


def _q_to_axis_angle(q):
    """Row-tuple version of quaternion.to_axis_angle (halfspace, shortest
    arc, angle in [0, pi]).  atan2(s, w) is rewritten as a two-branch
    polynomial asin (Mosaic-lowerable; s,w >= 0 after halfspace flip and
    s^2+w^2=1, so half-angle = asin(s) for s<=w else pi/2-asin(w))."""
    x, y, z, w = _qnormalize(q)
    sign = jnp.where(w < 0.0, -1.0, 1.0)
    x, y, z, w = x * sign, y * sign, z * sign, w * sign
    s = jnp.sqrt(x * x + y * y + z * z)
    s_c = jnp.clip(s, 0.0, 1.0)
    w_c = jnp.clip(w, 0.0, 1.0)
    a = _asin_core(jnp.minimum(s_c, w_c))
    half = jnp.where(s_c <= w_c, a, jnp.float32(0.5 * jnp.pi) - a)
    angle = 2.0 * half
    k = angle / jnp.maximum(s, 1e-8)
    return (x * k, y * k, z * k)


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


def _make_kernel(model, lean: bool = False, fuse_spd: bool = False,
                 fuse_self: bool = False):
    """lean=True: held-inverse warm substeps never read the mass matrix, so
    S / I_sp / V (and the com/velocity FK fields) are dead OUTPUTS — Pallas
    writes cannot be DCE'd by XLA, so a separate kernel skips them (~80% of
    the full kernel's HBM write rows).  The RNEA still computes them
    internally for the bias force; only the write set shrinks.

    fuse_spd=True: the stable-PD torque (physics/step.spd_torque) is
    computed in-kernel from two extra inputs (target_q, target_w) and the
    c output becomes tau - damping*vel - c, so the whole XLA-side SPD
    elementwise chain (quat integrate/mul/axis-angle, dof projection,
    clamp) disappears.  Residual root wrenches / direct torques, when
    present, are added by the caller in XLA (6 rows)."""
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

    if fuse_self:
        sc_pairs = np.asarray(model.self_pairs)
        sc_a = np.asarray(model.cap_a)
        sc_b = np.asarray(model.cap_b)
        sc_r = np.asarray(model.cap_r, dtype=np.float64)

    if fuse_spd:
        kp_v = np.asarray(model.kp, dtype=np.float64)
        kd_v = np.asarray(model.kd, dtype=np.float64)
        maxf_v = np.asarray(model.max_force, dtype=np.float64)
        damping_v = np.asarray(model.damping, dtype=np.float64)
        mov_joints = np.asarray(model.mov_joints)
        mov_T = np.asarray(model.mov_dof_T, dtype=np.float64)
        dt_sim = float(model.params.dt_sim)

    def kernel(root_ref, jq_ref, om_ref, vel_ref, *refs):
        if fuse_spd:
            tq_ref, tw_ref = refs[0], refs[1]
            out_refs = refs[2:]
        else:
            out_refs = refs
        sc_out = None
        if fuse_self:
            out_refs, sc_out = out_refs[:-1], out_refs[-1]
        if lean:
            q_out, p_out, c_out, x_out = out_refs
        else:
            (q_out, p_out, w_out, vo_out, com_out, vcom_out,
             S_out, I_out, V_out, c_out, x_out) = out_refs

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

        # ---------------- self-collision narrow phase ------------------
        # Capsule-capsule closest points over the static pair list,
        # VECTORIZED as (P, Bt) tensors (no per-pair unrolling): the
        # world endpoints per body are row tuples already in registers;
        # per-pair operands are stacks of those rows (the pair list is a
        # compile-time constant, so "gathers" are free restacking).
        # Same formulas as self_collision.self_pair_features /
        # segment_closest_points; the XLA version materialized
        # ~150 MB/substep of (B,263,3) intermediates in HBM (r4 trace).
        if fuse_self:
            P_ = sc_pairs.shape[0]
            bi_l = sc_pairs[:, 0]
            bj_l = sc_pairs[:, 1]
            wa = [_add(body_p[b], _mat_const_vec(Rm[b], sc_a[b]))
                  for b in range(NB)]
            wb = [_add(body_p[b], _mat_const_vec(Rm[b], sc_b[b]))
                  for b in range(NB)]

            def pstack(ws, idx, i):
                return jnp.stack([ws[int(bb)][i] for bb in idx])  # (P,Bt)

            p1 = [pstack(wa, bi_l, i) for i in range(3)]
            q1 = [pstack(wb, bi_l, i) for i in range(3)]
            p2 = [pstack(wa, bj_l, i) for i in range(3)]
            q2 = [pstack(wb, bj_l, i) for i in range(3)]
            d1 = [q1[i] - p1[i] for i in range(3)]
            d2 = [q2[i] - p2[i] for i in range(3)]
            rv = [p1[i] - p2[i] for i in range(3)]

            def dot3(u, v):
                return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

            a_ = dot3(d1, d1)
            e_ = dot3(d2, d2)
            f_ = dot3(d2, rv)
            cc = dot3(d1, rv)
            bq = dot3(d1, d2)
            denom = a_ * e_ - bq * bq
            s = jnp.where(denom > 1e-12,
                          (bq * f_ - cc * e_) / jnp.maximum(denom, 1e-12),
                          0.0)
            s = jnp.clip(s, 0.0, 1.0)
            t = jnp.where(e_ > 1e-12,
                          (bq * s + f_) / jnp.maximum(e_, 1e-12), 0.0)
            t = jnp.clip(t, 0.0, 1.0)
            s = jnp.where(e_ > 1e-12,
                          jnp.clip((bq * t - cc) / jnp.maximum(a_, 1e-12),
                                   0.0, 1.0), s)
            x1 = [p1[i] + s * d1[i] for i in range(3)]
            x2 = [p2[i] + t * d2[i] for i in range(3)]
            dv3 = [x1[i] - x2[i] for i in range(3)]
            dist = jnp.sqrt(dot3(dv3, dv3))
            safe = jnp.maximum(dist, 1e-8)
            # rows: [dist(P); px;py;pz (P each); nx;ny;nz].  depth =
            # (r_i + r_j) - dist is applied OUTSIDE (the per-pair radius
            # sum is a non-scalar constant, which a Pallas kernel cannot
            # capture; one (B,P) elementwise op in XLA is negligible).
            sc_out[0:P_, :] = dist
            for i in range(3):
                sc_out[(1 + i) * P_:(2 + i) * P_, :] = 0.5 * (x1[i] + x2[i])
                sc_out[(4 + i) * P_:(5 + i) * P_, :] = dv3[i] / safe

        # ---------------- writes ---------------------------------------
        for b in range(NB):
            for k in range(4):
                q_out[4 * b + k, :] = body_q[b][k]
            for k in range(3):
                p_out[3 * b + k, :] = body_p[b][k]
                if not lean:
                    w_out[3 * b + k, :] = body_w[b][k]
                    vo_out[3 * b + k, :] = body_v[b][k]
                    com_out[3 * b + k, :] = body_com[b][k]
                    vcom_out[3 * b + k, :] = body_vcom[b][k]
            if not lean:
                for a in range(6):
                    V_out[6 * b + a, :] = V[b][a]
                    for bb in range(6):
                        e = I_sp[b][a][bb]
                        if e is None:
                            e = body_p[0][0] * 0.0
                        elif isinstance(e, float):
                            e = body_p[0][0] * 0.0 + e
                        I_out[36 * b + 6 * a + bb, :] = e
        if fuse_spd:
            # stable-PD error/velocity terms per movable joint
            # (physics/step.spd_torque: q advanced by dt*omega, axis-angle
            # error to the target, target_w - omega)
            err_m, dw_m = [], []
            for mi in range(len(mov_joints)):
                j = int(mov_joints[mi])
                qj = rows(jq_ref, 4 * j, 4)
                omj = rows(om_ref, 3 * j, 3)
                q_adv = _qnormalize(_qmul(
                    qj, _q_from_axis_angle(tuple(o * dt_sim for o in omj))))
                e = _qmul(_qconj(q_adv), rows(tq_ref, 4 * j, 4))
                err_m.append(_q_to_axis_angle(e))
                tw = rows(tw_ref, 3 * j, 3)
                dw_m.append(tuple(tw[i] - omj[i] for i in range(3)))

        zero = body_p[0][0] * 0.0
        for d in range(NV):
            if not lean:
                for i in range(6):
                    e = S[d][i]
                    S_out[6 * d + i, :] = (zero + e) \
                        if isinstance(e, float) else e
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
            c_d = acc if acc is not None else zero
            if not fuse_spd:
                c_out[d, :] = c_d
                continue
            # emit tau - damping*vel - c instead of c
            tau_d = None
            if d >= 6:
                pe = pw = None
                for mi in range(len(mov_joints)):
                    for i in range(3):
                        t = float(mov_T[mi, d - 6, i])
                        if t == 0.0:
                            continue
                        te = err_m[mi][i] * t
                        tw_ = dw_m[mi][i] * t
                        pe = te if pe is None else pe + te
                        pw = tw_ if pw is None else pw + tw_
                if pe is not None:
                    v = float(kp_v[d]) * pe + float(kd_v[d]) * pw
                    mf = float(maxf_v[d])
                    tau_d = jnp.clip(v, -mf, mf)
            tmc = (-c_d) if tau_d is None else (tau_d - c_d)
            dmp = float(damping_v[d])
            if dmp != 0.0:
                tmc = tmc - dmp * vel_ref[d, :]
            c_out[d, :] = tmc

    return kernel


_CACHE = {}


def dynamics_fused_fm(model, root13, jq, om, vel, tq=None, tw=None,
                      interpret=False, lean=False, fuse_spd=False,
                      fuse_self=False):
    """Feature-major entry: root13 (13,B), jq (4J,B), om (3J,B), vel (NV,B);
    with fuse_spd also tq (4J,B), tw (3J,B).

    Returns (q, p, w, vo, com, vcom, S, I, V, c, x) feature-major, or
    (q, p, c, x) with lean=True; with fuse_spd the c slot holds
    tau - damping*vel - c instead.  With fuse_self an extra trailing
    output (7P, B) carries the self-collision narrow phase:
    [depth; pos xyz; normal xyz] per static pair."""
    NB = model.num_bodies
    J = model.num_joints
    NV = model.nv
    NP_ = model.point_body.shape[0]
    B = root13.shape[-1]
    Bt = min(256, _round_up(B, 128))
    Bp = _round_up(B, Bt)
    ins = [root13, jq, om, vel] + ([tq, tw] if fuse_spd else [])
    if Bp != B:
        pad = lambda x: jnp.pad(x, ((0, 0), (0, Bp - B)))
        ins = [pad(v) for v in ins]

    key = (id(model), lean, fuse_spd, fuse_self)
    if key not in _CACHE:
        _CACHE[key] = _make_kernel(model, lean, fuse_spd, fuse_self)
    kernel = _CACHE[key]

    def spec(rowsn):
        return pl.BlockSpec((rowsn, Bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    if lean:
        out_rows = [4 * NB, 3 * NB, NV, 3 * NP_]
    else:
        out_rows = [4 * NB, 3 * NB, 3 * NB, 3 * NB, 3 * NB, 3 * NB,
                    6 * NV, 36 * NB, 6 * NB, NV, 3 * NP_]
    if fuse_self:
        out_rows = out_rows + [7 * model.self_pairs.shape[0]]
    in_rows = [13, 4 * J, 3 * J, NV] + ([4 * J, 3 * J] if fuse_spd else [])
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // Bt,),
        in_specs=[spec(r) for r in in_rows],
        out_specs=[spec(r) for r in out_rows],
        out_shape=[jax.ShapeDtypeStruct((r, Bp), jnp.float32)
                   for r in out_rows],
        interpret=interpret,
    )(*ins)
    return tuple(o[:, :B] for o in outs)


def _fm_inputs(model, state):
    from ..physics.state import joint_omega
    B = state.root_p.shape[0]
    J = model.num_joints
    om = joint_omega(model, state)
    root13 = jnp.concatenate(
        [state.root_p, state.root_q, state.vel[:, 0:3], state.vel[:, 3:6]],
        axis=-1).T
    jq = state.joint_q.reshape(B, 4 * J).T
    omf = om.reshape(B, 3 * J).T
    return root13, jq, omf, state.vel.T


def _dof_tables(model, body_q, body_p):
    """Per-dof world axis/anchor tables (same as fk)."""
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
    return dof_axis, dof_pos


def _wants_self_fuse(model):
    p = model.params
    return (p.self_collision and getattr(p, "fuse_self_narrow", True)
            and model.self_pairs.shape[0] > 0)


def _sc_unpack(model, sc):
    """(7P,B) kernel rows -> (pos (B,P,3), normal (B,P,3), depth (B,P)).

    Row 0..P holds DIST; depth = (r_i + r_j) - dist is applied here (the
    radius-sum constant cannot be captured inside the kernel)."""
    pairs = np.asarray(model.self_pairs)
    cap_r = np.asarray(model.cap_r)
    rsum = jnp.asarray((cap_r[pairs[:, 0]] + cap_r[pairs[:, 1]]
                        ).astype(np.float32))
    P_ = pairs.shape[0]
    m = sc.T.reshape(-1, 7, P_)
    return (jnp.transpose(m[:, 1:4, :], (0, 2, 1)),
            jnp.transpose(m[:, 4:7, :], (0, 2, 1)), rsum - m[:, 0, :])


def dynamics_terms_fused(model, state, interpret=False):
    """Drop-in for (fk, dynamics_terms, contact_point_positions
    [+ self_pair_features]):

    returns (FKResult, S (B,NV,6), I_sp (B,NB,6,6), V (B,NB,6), c (B,NV),
    x (B,NP,3), sc) with sc = (pos, normal, depth) over the static
    self-collision pair list, or None when self-fusion is off.  Batched
    states only."""
    from ..physics.fk import FKResult

    assert state.root_p.ndim == 2, "fused dynamics expects a batched state"
    B = state.root_p.shape[0]
    NB = model.num_bodies
    NV = model.nv
    NP_ = model.point_body.shape[0]

    fuse_self = _wants_self_fuse(model)
    outs = dynamics_fused_fm(
        model, *_fm_inputs(model, state), interpret=interpret,
        fuse_self=fuse_self)
    sc = None
    if fuse_self:
        outs, sc = outs[:-1], _sc_unpack(model, outs[-1])
    (q, p, w, vo, com, vcom, S, I, V, c, x) = outs

    body_q = q.T.reshape(B, NB, 4)
    body_p = p.T.reshape(B, NB, 3)
    dof_axis, dof_pos = _dof_tables(model, body_q, body_p)

    k = FKResult(
        body_q=body_q, body_p=body_p,
        body_com=com.T.reshape(B, NB, 3),
        body_w=w.T.reshape(B, NB, 3),
        body_vcom=vcom.T.reshape(B, NB, 3),
        body_vo=vo.T.reshape(B, NB, 3),
        dof_axis=dof_axis, dof_pos=dof_pos)
    return (k, S.T.reshape(B, NV, 6), I.T.reshape(B, NB, 6, 6),
            V.T.reshape(B, NB, 6), c.T.reshape(B, NV),
            x.T.reshape(B, NP_, 3), sc)


def dynamics_terms_fused_lean(model, state, target_q=None, target_w=None,
                              interpret=False):
    """Held-inverse warm-substep variant: returns (FKResult, c, x, sc)
    with only the fields the contact pipeline consumes (body_q/body_p for
    the jacobians and narrow phases, dof tables); body_com/w/vcom/vo are
    None and S/I_sp/V are never written (see _make_kernel lean
    docstring).  sc = (pos, normal, depth) self-collision pair features,
    or None when self-fusion is off.

    With target_q/target_w ((B,J,4)/(B,J,3)), the stable-PD torque is
    fused in-kernel and the c slot returns tau - damping*vel - c."""
    from ..physics.fk import FKResult

    assert state.root_p.ndim == 2, "fused dynamics expects a batched state"
    B = state.root_p.shape[0]
    NB = model.num_bodies
    J = model.num_joints
    NP_ = model.point_body.shape[0]

    fuse_spd = target_q is not None
    fuse_self = _wants_self_fuse(model)
    extra = {}
    if fuse_spd:
        extra = dict(tq=target_q.reshape(B, 4 * J).T,
                     tw=target_w.reshape(B, 3 * J).T)
    outs = dynamics_fused_fm(
        model, *_fm_inputs(model, state), interpret=interpret, lean=True,
        fuse_spd=fuse_spd, fuse_self=fuse_self, **extra)
    sc = None
    if fuse_self:
        outs, sc = outs[:-1], _sc_unpack(model, outs[-1])
    q, p, c, x = outs

    body_q = q.T.reshape(B, NB, 4)
    body_p = p.T.reshape(B, NB, 3)
    dof_axis, dof_pos = _dof_tables(model, body_q, body_p)

    k = FKResult(
        body_q=body_q, body_p=body_p,
        body_com=None, body_w=None, body_vcom=None, body_vo=None,
        dof_axis=dof_axis, dof_pos=dof_pos)
    return k, c.T.reshape(B, model.nv), x.T.reshape(B, NP_, 3), sc


def _sel_raw_outputs(model, state, lean: bool, target_q=None,
                     target_w=None, interpret=False):
    """dynamics_terms_fused[_lean] minus the candidate-point conversions:
    the contact-point rows x (3NP, B) and self-collision narrow-phase
    rows sc (7P, B) come back RAW feature-major for the select-then-
    transpose path (physics/step._fused_dynamics_sel), which selects the
    top-K in that layout and only transposes the K winners.  Everything
    else (FKResult, dynamics terms) is batch-major as usual.

    Returns lean: (k, c_or_tmc, x_fm, sc_fm);
    full: (k, S, I_sp, V, c, x_fm, sc_fm).  sc_fm is None when
    self-fusion is off."""
    from ..physics.fk import FKResult

    assert state.root_p.ndim == 2, "fused dynamics expects a batched state"
    B = state.root_p.shape[0]
    NB = model.num_bodies
    J = model.num_joints
    NV = model.nv

    fuse_spd = target_q is not None
    fuse_self = _wants_self_fuse(model)
    extra = {}
    if fuse_spd:
        extra = dict(tq=target_q.reshape(B, 4 * J).T,
                     tw=target_w.reshape(B, 3 * J).T)
    outs = dynamics_fused_fm(
        model, *_fm_inputs(model, state), interpret=interpret, lean=lean,
        fuse_spd=fuse_spd, fuse_self=fuse_self, **extra)
    sc_fm = None
    if fuse_self:
        outs, sc_fm = outs[:-1], outs[-1]
    if lean:
        q, p, c, x_fm = outs
        body_q = q.T.reshape(B, NB, 4)
        body_p = p.T.reshape(B, NB, 3)
        dof_axis, dof_pos = _dof_tables(model, body_q, body_p)
        k = FKResult(
            body_q=body_q, body_p=body_p,
            body_com=None, body_w=None, body_vcom=None, body_vo=None,
            dof_axis=dof_axis, dof_pos=dof_pos)
        return k, c.T.reshape(B, NV), x_fm, sc_fm
    (q, p, w, vo, com, vcom, S, I, V, c, x_fm) = outs
    body_q = q.T.reshape(B, NB, 4)
    body_p = p.T.reshape(B, NB, 3)
    dof_axis, dof_pos = _dof_tables(model, body_q, body_p)
    k = FKResult(
        body_q=body_q, body_p=body_p,
        body_com=com.T.reshape(B, NB, 3), body_w=w.T.reshape(B, NB, 3),
        body_vcom=vcom.T.reshape(B, NB, 3),
        body_vo=vo.T.reshape(B, NB, 3),
        dof_axis=dof_axis, dof_pos=dof_pos)
    return (k, S.T.reshape(B, NV, 6), I.T.reshape(B, NB, 6, 6),
            V.T.reshape(B, NB, 6), c.T.reshape(B, NV), x_fm, sc_fm)
