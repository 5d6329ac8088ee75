"""Trajectory exporters: BVH round-trip and gym adapter config_override."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.kinematics.bvh import load_bvh
from physicsvae_tpu.kinematics.char_info import load_char_info
from physicsvae_tpu.kinematics import motion as motion_mod
from physicsvae_tpu.maths import quaternion as quat
from physicsvae_tpu.runtime.export import export_bvh, export_json

BVH_HIER = "/root/reference/data/motion/loco/loco_hierarchy.bvh"
CHAR_INFO = "/root/reference/data/character/info/loco_char_info.py"


def test_bvh_export_roundtrip(tmp_path):
    char = load_char_info(CHAR_INFO)
    hier = load_bvh(BVH_HIER)
    m = motion_mod.retarget(hier, char)

    T = 5
    root_p = np.asarray(m.root_p[:T])
    root_q = np.asarray(m.root_q[:T])
    joint_q = np.asarray(m.joint_q[:T])

    out = str(tmp_path / "traj.bvh")
    export_bvh(out, char, hier, root_p, root_q, joint_q, fps=30.0)

    # the exported file parses and reproduces the trajectory
    re = load_bvh(out, use_native=False)
    assert re.num_frames == T
    assert re.skel.joint_names == hier.skel.joint_names
    m2 = motion_mod.retarget(re, char)
    assert np.allclose(np.asarray(m2.root_p), root_p, atol=1e-4)
    dot = np.abs(np.sum(np.asarray(m2.root_q) * root_q, axis=-1))
    assert np.allclose(dot, 1.0, atol=1e-4)
    # joint rotations survive the quaternion->euler->quaternion round trip
    dotj = np.abs(np.sum(np.asarray(m2.joint_q) * joint_q, axis=-1))
    assert np.allclose(dotj, 1.0, atol=1e-3), dotj.min()


def test_json_export(tmp_path):
    out = str(tmp_path / "traj.json")
    body_p = np.zeros((3, 25, 3))
    body_q = np.zeros((3, 25, 4))
    body_q[..., 3] = 1.0
    export_json(out, body_p, body_q, fps=30.0,
                link_names=["l%d" % i for i in range(25)])
    import json
    with open(out) as f:
        data = json.load(f)
    assert len(data["frames"]) == 3
    assert data["fps"] == 30.0


def test_gym_adapter_and_config_override():
    from physicsvae_tpu.runtime.gym_adapter import (HumanoidImitation,
                                                    config_override)
    from physicsvae_tpu.env.config import load_spec

    spec = load_spec("/root/reference/data/spec/loco/loco_test.yaml")
    env = HumanoidImitation(spec["config"]["env_config"],
                            project_dir="/root/reference")
    assert env.observation_space.shape == (1095,)
    assert env.observation_space_body.shape == (361,)
    assert env.observation_space_task.shape == (734,)
    assert env.action_space.shape == (54,)

    obs = env.reset({"ref_motion_id": [0], "start_time": np.array([0.5])})
    assert obs.shape == (1095,)
    obs2, rew, done, info = env.step(np.zeros(54))
    assert np.isfinite(rew) and 0 < rew <= 1
    assert "rew_info" in info and "eoe_reason" in info

    cfg = config_override(spec, project_dir="/root/reference")
    cmc = cfg["model"]["custom_model_config"]
    assert cmc["observation_space_body"].shape == (361,)
    assert cmc["observation_space_task"].shape == (734,)
