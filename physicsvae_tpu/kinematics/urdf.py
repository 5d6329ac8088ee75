"""Host-side URDF -> static CharacterModel pytree compiler.

Replaces PyBullet's C++ URDF loader (reference: sim_agent.py:74,
envs/env_humanoid_tracking.py:223-228).  Runs once on the host with numpy;
the result is a frozen bundle of arrays that the batched JAX physics core
consumes directly.
"""
from __future__ import annotations

import dataclasses
import xml.etree.ElementTree as ET

import numpy as np

# Joint type codes
SPHERICAL = 0
REVOLUTE = 1
FIXED = 2

# Geom type codes
GEOM_SPHERE = 0
GEOM_CAPSULE = 1
GEOM_BOX = 2

_JOINT_TYPE_MAP = {
    "spherical": SPHERICAL,
    "revolute": REVOLUTE,
    "continuous": REVOLUTE,
    "fixed": FIXED,
}


def _rpy_to_matrix(rpy):
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def _matrix_to_quat(m):
    """xyzw quaternion from rotation matrix (numpy, host-side)."""
    tr = np.trace(m)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array(
            [(m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
             (m[1, 0] - m[0, 1]) / s, 0.25 * s])
    i = np.argmax(np.diag(m))
    if i == 0:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        q = [0.25 * s, (m[0, 1] + m[1, 0]) / s, (m[0, 2] + m[2, 0]) / s,
             (m[2, 1] - m[1, 2]) / s]
    elif i == 1:
        s = np.sqrt(1.0 - m[0, 0] + m[1, 1] - m[2, 2]) * 2
        q = [(m[0, 1] + m[1, 0]) / s, 0.25 * s, (m[1, 2] + m[2, 1]) / s,
             (m[0, 2] - m[2, 0]) / s]
    else:
        s = np.sqrt(1.0 - m[0, 0] - m[1, 1] + m[2, 2]) * 2
        q = [(m[0, 2] + m[2, 0]) / s, (m[1, 2] + m[2, 1]) / s, 0.25 * s,
             (m[1, 0] - m[0, 1]) / s]
    q = np.asarray(q)
    return q / np.linalg.norm(q)


def _parse_origin(elem):
    xyz = np.zeros(3)
    rpy = np.zeros(3)
    if elem is not None:
        o = elem.find("origin")
        if o is not None:
            if o.get("xyz"):
                xyz = np.fromstring(o.get("xyz"), sep=" ")
            if o.get("rpy"):
                rpy = np.fromstring(o.get("rpy"), sep=" ")
    return xyz, rpy


@dataclasses.dataclass
class CharacterModel:
    """Static articulated-body description (all numpy; frozen after load).

    Link indexing follows Bullet: link j is the child of joint j
    (j in [0, num_joints)); the floating base is separate ("base_*" fields).
    """

    name: str
    link_names: list            # length J (joint/link names, joint j <-> link j)
    num_joints: int

    # Base (root) link
    base_mass: float
    base_com: np.ndarray        # (3,) COM offset in base frame
    base_inertia: np.ndarray    # (3,3) about COM, base frame

    # Joints / links
    joint_type: np.ndarray      # (J,) int
    parent: np.ndarray          # (J,) int, parent LINK index; -1 = base
    joint_pos: np.ndarray       # (J,3) joint origin in parent link frame
    joint_quat: np.ndarray      # (J,4) joint frame rotation in parent frame
    joint_axis: np.ndarray      # (J,3)
    mass: np.ndarray            # (J,)
    com: np.ndarray             # (J,3) COM offset in link frame
    inertia: np.ndarray         # (J,3,3) about COM, link frame

    # Collision geometry, flattened over all links (base included, link=-1)
    geom_link: np.ndarray       # (G,) int
    geom_type: np.ndarray       # (G,) int
    geom_pos: np.ndarray        # (G,3) in link frame
    geom_quat: np.ndarray      # (G,4)
    geom_size: np.ndarray       # (G,3) sphere:(r,0,0) capsule:(r,hl,0) box:half-extents

    def joint_index(self, name: str) -> int:
        return self.link_names.index(name)

    @property
    def total_mass(self) -> float:
        return float(self.base_mass + self.mass.sum())

    @property
    def movable(self) -> np.ndarray:
        return self.joint_type != FIXED


def _parse_inertial(link):
    inertial = link.find("inertial")
    if inertial is None:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    xyz, rpy = _parse_origin(inertial)
    mass = float(inertial.find("mass").get("value"))
    ine = inertial.find("inertia")
    ixx = float(ine.get("ixx", 0)); iyy = float(ine.get("iyy", 0))
    izz = float(ine.get("izz", 0)); ixy = float(ine.get("ixy", 0))
    ixz = float(ine.get("ixz", 0)); iyz = float(ine.get("iyz", 0))
    I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
    R = _rpy_to_matrix(rpy)
    return mass, xyz, R @ I @ R.T


def _parse_geoms(link, link_idx, out):
    for col in link.findall("collision"):
        xyz, rpy = _parse_origin(col)
        quat = _matrix_to_quat(_rpy_to_matrix(rpy))
        geo = col.find("geometry")
        if geo is None:
            continue
        sphere = geo.find("sphere")
        capsule = geo.find("capsule")
        cylinder = geo.find("cylinder")
        box = geo.find("box")
        if sphere is not None:
            gtype = GEOM_SPHERE
            r = float(sphere.get("radius"))
            size = np.array([r, 0.0, 0.0])
        elif capsule is not None or cylinder is not None:
            g = capsule if capsule is not None else cylinder
            gtype = GEOM_CAPSULE
            r = float(g.get("radius"))
            hl = 0.5 * float(g.get("length"))
            size = np.array([r, hl, 0.0])
        elif box is not None:
            gtype = GEOM_BOX
            size = 0.5 * np.fromstring(box.get("size"), sep=" ")
        else:
            continue
        out.append((link_idx, gtype, xyz, quat, size))


def load_urdf(path: str) -> CharacterModel:
    tree = ET.parse(path)
    robot = tree.getroot()
    name = robot.get("name", "robot")

    links = {l.get("name"): l for l in robot.findall("link")}
    joints = robot.findall("joint")

    # The base link is the one that is never a child.
    children = {j.find("child").get("link") for j in joints}
    base_name = next(n for n in links if n not in children)

    # Order joints to match PyBullet URDF_MAINTAIN_LINK_ORDER: file order.
    link_names = [j.find("child").get("link") for j in joints]
    link_index = {n: i for i, n in enumerate(link_names)}
    link_index[base_name] = -1

    J = len(joints)
    joint_type = np.zeros(J, dtype=np.int32)
    parent = np.zeros(J, dtype=np.int32)
    joint_pos = np.zeros((J, 3))
    joint_quat = np.zeros((J, 4)); joint_quat[:, 3] = 1.0
    joint_axis = np.zeros((J, 3)); joint_axis[:, 2] = 1.0
    mass = np.zeros(J)
    com = np.zeros((J, 3))
    inertia = np.zeros((J, 3, 3))

    geoms = []
    base_mass, base_com, base_inertia = _parse_inertial(links[base_name])
    _parse_geoms(links[base_name], -1, geoms)

    for i, j in enumerate(joints):
        jt = j.get("type")
        joint_type[i] = _JOINT_TYPE_MAP[jt]
        parent[i] = link_index[j.find("parent").get("link")]
        xyz, rpy = _parse_origin(j)
        joint_pos[i] = xyz
        joint_quat[i] = _matrix_to_quat(_rpy_to_matrix(rpy))
        ax = j.find("axis")
        if ax is not None and ax.get("xyz"):
            joint_axis[i] = np.fromstring(ax.get("xyz"), sep=" ")
        child_name = j.find("child").get("link")
        m, c, I = _parse_inertial(links[child_name])
        mass[i], com[i], inertia[i] = m, c, I
        _parse_geoms(links[child_name], i, geoms)

    # Verify topological ordering (parent index < child's joint index).
    for i in range(J):
        assert parent[i] < i, "URDF joints must be topologically ordered"

    if geoms:
        geom_link = np.array([g[0] for g in geoms], dtype=np.int32)
        geom_type = np.array([g[1] for g in geoms], dtype=np.int32)
        geom_pos = np.stack([g[2] for g in geoms])
        geom_quat = np.stack([g[3] for g in geoms])
        geom_size = np.stack([g[4] for g in geoms])
    else:
        geom_link = np.zeros(0, dtype=np.int32)
        geom_type = np.zeros(0, dtype=np.int32)
        geom_pos = np.zeros((0, 3))
        geom_quat = np.zeros((0, 4))
        geom_size = np.zeros((0, 3))

    return CharacterModel(
        name=name,
        link_names=link_names,
        num_joints=J,
        base_mass=base_mass,
        base_com=base_com,
        base_inertia=base_inertia,
        joint_type=joint_type,
        parent=parent,
        joint_pos=joint_pos,
        joint_quat=joint_quat,
        joint_axis=joint_axis,
        mass=mass,
        com=com,
        inertia=inertia,
        geom_link=geom_link,
        geom_type=geom_type,
        geom_pos=geom_pos,
        geom_quat=geom_quat,
        geom_size=geom_size,
    )
