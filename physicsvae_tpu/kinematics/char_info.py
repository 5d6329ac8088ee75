"""Character-info ingestion.

The reference keeps per-character metadata as importable Python modules
(data-as-code, e.g. reference data/character/info/loco_char_info.py) loaded
via importlib (envs/env_humanoid_tracking.py:103-107).  We keep the same file
format for spec compatibility: the module is exec'd once on the host and
frozen into arrays indexed by joint order.
"""
from __future__ import annotations

import dataclasses
import importlib.util

import numpy as np


@dataclasses.dataclass
class CharInfo:
    name: str
    v_up: np.ndarray
    v_face: np.ndarray
    v_up_env: np.ndarray

    joint_names: list          # length J, ordered by joint index
    root_name: str
    end_effectors: np.ndarray  # link indices
    bvh_map: list              # length J of (bvh joint name | None)
    root_bvh_name: str

    dof: np.ndarray            # (J,)
    kp: np.ndarray             # (J,) spd gains
    kd: np.ndarray             # (J,)
    kp_pd: np.ndarray          # (J,) explicit-PD gains (kp['pd'], else spd)
    kd_pd: np.ndarray          # (J,)
    cpd_ratio: float
    max_force: np.ndarray      # (J,)
    contact_allow: np.ndarray  # (J,) bool — link may touch ground
    root_contact_allow: bool
    joint_weight: np.ndarray   # (J,) normalized
    root_joint_weight: float
    collision_ignore_pairs: np.ndarray  # (P,2) link index pairs
    friction_lateral: float
    friction_spinning: float
    restitution: float

    @property
    def num_joints(self):
        return len(self.joint_names)


def apply_contactable_body(ci: "CharInfo", contactable_body):
    """Override the contact-allow map from the spec's `contactable_body`
    (envs/env_humanoid_tracking.py:108-113)."""
    import dataclasses as _dc
    if not contactable_body:
        return ci
    allow_all = "all" in contactable_body
    allow = np.array([allow_all or n in contactable_body
                      for n in ci.joint_names])
    return _dc.replace(
        ci, contact_allow=allow,
        root_contact_allow=allow_all or ci.root_name in contactable_body)


def load_char_info(path: str) -> CharInfo:
    spec = importlib.util.spec_from_file_location("char_info_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    root_idx = mod.ROOT
    # joint_name maps index -> name; indices >= 0 are joints, ROOT is -1.
    joint_indices = sorted(k for k in mod.joint_name.keys() if k != root_idx)
    J = len(joint_indices)
    assert joint_indices == list(range(J))
    joint_names = [mod.joint_name[j] for j in range(J)]

    def arr(d, default=0.0):
        return np.array([float(d.get(j, default)) for j in range(J)])

    kp = arr(mod.kp["spd"]) if isinstance(mod.kp, dict) and "spd" in mod.kp else arr(mod.kp)
    kd = arr(mod.kd["spd"]) if isinstance(mod.kd, dict) and "spd" in mod.kd else arr(mod.kd)
    # Explicit-PD gains: kp['pd'] when the char-info defines them
    # (sim_agent.py:177-179), falling back to the spd set.
    kp_pd = arr(mod.kp["pd"]) if isinstance(mod.kp, dict) and "pd" in mod.kp \
        else kp
    kd_pd = arr(mod.kd["pd"]) if isinstance(mod.kd, dict) and "pd" in mod.kd \
        else kd

    return CharInfo(
        name=getattr(mod, "name", "character"),
        v_up=np.asarray(mod.v_up, dtype=np.float64),
        v_face=np.asarray(mod.v_face, dtype=np.float64),
        v_up_env=np.asarray(mod.v_up_env, dtype=np.float64),
        joint_names=joint_names,
        root_name=mod.joint_name[root_idx],
        end_effectors=np.asarray(mod.end_effector_indices, dtype=np.int32),
        bvh_map=[mod.bvh_map[j] for j in range(J)],
        root_bvh_name=mod.bvh_map[root_idx],
        dof=np.array([int(mod.dof[j]) for j in range(J)], dtype=np.int32),
        kp=kp,
        kd=kd,
        kp_pd=kp_pd,
        kd_pd=kd_pd,
        cpd_ratio=float(getattr(mod, "cpd_ratio", 1.0)),
        max_force=arr(mod.max_force),
        contact_allow=np.array(
            [bool(mod.contact_allow_map[j]) for j in range(J)]),
        root_contact_allow=bool(mod.contact_allow_map[root_idx]),
        joint_weight=np.array([float(mod.joint_weight[j]) for j in range(J)]),
        root_joint_weight=float(mod.joint_weight[root_idx]),
        collision_ignore_pairs=np.asarray(
            getattr(mod, "collison_ignore_pairs", []), dtype=np.int32
        ).reshape(-1, 2),
        friction_lateral=float(getattr(mod, "friction_lateral", 0.8)),
        friction_spinning=float(getattr(mod, "friction_spinning", 0.0)),
        restitution=float(getattr(mod, "restitution", 0.0)),
    )
