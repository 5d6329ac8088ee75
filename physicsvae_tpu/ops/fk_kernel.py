"""Pallas forward-kinematics kernel.

Why: FK dominates the physics substep (~8 ms of a 13.5 ms substep at
B=2048).  In XLA it is ~130 dispatched ops on (B, L, 3/4) tensors whose
trailing dims waste 97% of the VPU lanes.  This kernel flips the layout —
features on sublanes, BATCH on lanes — and unrolls the whole 24-joint tree
inside VMEM: zero dispatch overhead, model constants (joint frames, offsets,
COMs) baked into the program as scalars.

Produces exactly the same quantities as physics/fk.fk (body_q/p/w/vo/com/
vcom); the per-dof tables are computed outside (they are einsum-shaped and
already efficient).  Enabled via SimParams.use_pallas_fk after validation;
always validated against the XLA path in tests (interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _round_up(x, m):
    return (x + m - 1) // m * m


# Row-tuple quaternion helpers: a quaternion is a tuple of 4 (1,Bt) rows
# (x, y, z, w); a vector is 3 rows.  All arithmetic is elementwise on rows.

def _qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    )


def _qmul_const_right(a, c):
    """a * c with c a constant python quaternion (xyzw floats)."""
    ax, ay, az, aw = a
    cx, cy, cz, cw = (float(v) for v in c)
    return (
        aw * cx + ax * cw + ay * cz - az * cy,
        aw * cy - ax * cz + ay * cw + az * cx,
        aw * cz + ax * cy - ay * cx + az * cw,
        aw * cw - ax * cx - ay * cy - az * cz,
    )


def _qrotate(q, v):
    """Rotate row-vector v by row-quaternion q: v + 2w(uxv) + 2ux(uxv)."""
    qx, qy, qz, qw = q
    vx, vy, vz = v
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    return (
        vx + qw * tx + (qy * tz - qz * ty),
        vy + qw * ty + (qz * tx - qx * tz),
        vz + qw * tz + (qx * ty - qy * tx),
    )


def _qrotate_const(q, c):
    """Rotate a constant vector c (python floats) by row-quaternion q."""
    qx, qy, qz, qw = q
    cx, cy, cz = (float(v) for v in c)
    tx = 2.0 * (qy * cz - qz * cy)
    ty = 2.0 * (qz * cx - qx * cz)
    tz = 2.0 * (qx * cy - qy * cx)
    return (
        cx + qw * tx + (qy * tz - qz * ty),
        cy + qw * ty + (qz * tx - qx * tz),
        cz + qw * tz + (qx * ty - qy * tx),
    )


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _sub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _make_kernel(model):
    """Build the kernel fn with the model's static tables baked in."""
    J = model.num_joints
    NB = model.num_bodies
    parent = np.asarray(model.body_parent)
    jpos = np.asarray(model.joint_pos)
    jquat = np.asarray(model.joint_quat)
    com_l = np.asarray(model.com)

    def kernel(root_ref, jq_ref, om_ref,
               q_ref, p_ref, w_ref, vo_ref, com_ref, vcom_ref):
        def rows(ref, i, n):
            return tuple(ref[i + k, :] for k in range(n))

        # body 0 = base
        body_q = [rows(root_ref, 3, 4)]
        body_p = [rows(root_ref, 0, 3)]
        body_v = [rows(root_ref, 7, 3)]
        body_w = [rows(root_ref, 10, 3)]

        for j in range(J):
            par = int(parent[j + 1])
            q_p = body_q[par]
            p_p = body_p[par]
            w_p = body_w[par]
            vo_p = body_v[par]
            q_frame = _qmul_const_right(q_p, jquat[j])
            r = _qrotate_const(q_p, jpos[j])
            p_j = _add(p_p, r)
            q_j = _qmul(q_frame, rows(jq_ref, 4 * j, 4))
            w_j = _add(w_p, _qrotate(q_j, rows(om_ref, 3 * j, 3)))
            vo_j = _add(vo_p, _cross(w_p, r))
            body_q.append(q_j)
            body_p.append(p_j)
            body_w.append(w_j)
            body_v.append(vo_j)

        for b in range(NB):
            for k in range(4):
                q_ref[4 * b + k, :] = body_q[b][k]
            rc = _qrotate_const(body_q[b], com_l[b])
            com_b = _add(body_p[b], rc)
            vcom_b = _add(body_v[b], _cross(body_w[b], rc))
            for k in range(3):
                p_ref[3 * b + k, :] = body_p[b][k]
                w_ref[3 * b + k, :] = body_w[b][k]
                vo_ref[3 * b + k, :] = body_v[b][k]
                com_ref[3 * b + k, :] = com_b[k]
                vcom_ref[3 * b + k, :] = vcom_b[k]

    return kernel


def fk_pallas_core(model, root13, jq, om, interpret=False):
    """root13: (13, B) = [p(3), q(4), v(3), w(3)]; jq: (4J, B); om: (3J, B).

    Returns (q (4NB,B), p, w, vo, com, vcom) feature-major arrays.
    """
    NB = model.num_bodies
    J = model.num_joints
    B = root13.shape[-1]
    Bt = min(512, _round_up(B, 128))
    Bp = _round_up(B, Bt)
    if Bp != B:
        pad = lambda x: jnp.pad(x, ((0, 0), (0, Bp - B)))
        root13, jq, om = pad(root13), pad(jq), pad(om)

    kernel = _make_kernel(model)
    out_shapes = [jax.ShapeDtypeStruct((4 * NB, Bp), jnp.float32)] + [
        jax.ShapeDtypeStruct((3 * NB, Bp), jnp.float32) for _ in range(5)]

    def spec(rows):
        return pl.BlockSpec((rows, Bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(Bp // Bt,),
        in_specs=[spec(13), spec(4 * J), spec(3 * J)],
        out_specs=[spec(4 * NB)] + [spec(3 * NB)] * 5,
        out_shape=out_shapes,
        interpret=interpret,
    )(root13, jq, om)
    return tuple(o[:, :B] for o in outs)


def fk_pallas(model, state, interpret: bool = False):
    """Drop-in FK: same FKResult as physics.fk.fk, via the Pallas kernel."""
    from ..physics.fk import FKResult
    from ..physics.state import joint_omega
    from ..maths import quaternion as quat

    assert state.root_p.ndim == 2, "fk_pallas expects a batched state"
    B = state.root_p.shape[0]
    J = model.num_joints
    NB = model.num_bodies

    om = joint_omega(model, state)                      # (B,J,3)
    root13 = jnp.concatenate(
        [state.root_p, state.root_q, state.vel[:, 0:3], state.vel[:, 3:6]],
        axis=-1).T                                       # (13,B)
    jq = state.joint_q.reshape(B, 4 * J).T
    omf = om.reshape(B, 3 * J).T

    q, p, w, vo, com, vcom = fk_pallas_core(model, root13, jq, omf,
                                            interpret)
    body_q = q.T.reshape(B, NB, 4)
    body_p = p.T.reshape(B, NB, 3)
    body_w = w.T.reshape(B, NB, 3)
    body_vo = vo.T.reshape(B, NB, 3)
    body_com = com.T.reshape(B, NB, 3)
    body_vcom = vcom.T.reshape(B, NB, 3)

    # Per-dof tables (einsum-shaped; stays in XLA)
    dof_body = jnp.asarray(model.dof_body)
    dof_joint = np.asarray(model.dof_joint)
    axis_local = jnp.asarray(model.dof_axis_local, dtype=body_q.dtype)
    R_bodies = quat.to_matrix(body_q)
    R_d = R_bodies[..., dof_body, :, :]
    axis_joint = jnp.einsum("...dij,dj->...di", R_d, axis_local)
    is_root_dof = jnp.asarray(dof_joint < 0)[:, None]
    dof_axis = jnp.where(is_root_dof, axis_local, axis_joint)
    dof_pos = body_p[..., dof_body, :]

    return FKResult(body_q=body_q, body_p=body_p, body_com=body_com,
                    body_w=body_w, body_vcom=body_vcom, body_vo=body_vo,
                    dof_axis=dof_axis, dof_pos=dof_pos)
