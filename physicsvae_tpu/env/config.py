"""Spec loading: the reference's YAML spec files run unchanged.

Mirrors rllib_driver.py:119-216 config handling and the env_config schema of
envs/env_humanoid_base.py:45-289 (single-agent subset — the loco pipeline
always uses num_agent == 1, envs/rllib_env_imitation.py:150).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import yaml


def load_spec(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def collect_motion_files(project_dir, ref_motion_db):
    """motion_utils.collect_motion_files parity (motion_utils.py:67-125):
    file/dir lists, cluster-label files (id rank score filename lines), and
    num_sample subsampling with random/top methods."""
    import random
    import re

    def join(p):
        return os.path.join(project_dir, p) if project_dir else p

    out = []
    for mdb in ref_motion_db:
        mdb = mdb or {}
        motions = []
        cluster = mdb.get("cluster_info")
        if cluster:
            assert mdb.get("data") is None, \
                "data must not be set when cluster_info is used"
            d = cluster.get("dir")
            label_file = cluster.get("label_file")
            sample_id = cluster.get("sample_id")
            assert label_file
            labels = {}
            with open(join(label_file)) as f:
                for line in f:
                    parts = re.split(r"[\t\n,: ]+", line.strip())
                    if len(parts) < 4:
                        continue
                    cid, rank, score, fname = (int(parts[0]), int(parts[1]),
                                               float(parts[2]), parts[3])
                    labels.setdefault(cid, []).append(
                        {"rank": rank, "score": score, "filename": fname})
            for j in sorted(labels.keys()):
                if sample_id and j != sample_id:
                    continue
                for label in labels[j]:
                    motions.append(join(os.path.join(d, label["filename"])))
        else:
            data = mdb.get("data") or {}
            for f in data.get("file") or []:
                motions.append(join(f))
            for d in data.get("dir") or []:
                full = join(d)
                motions += sorted(
                    os.path.join(full, f) for f in os.listdir(full)
                    if f.endswith(".bvh"))
        num_sample = mdb.get("num_sample")
        if num_sample:
            method = mdb.get("sample_method")
            if method == "random":
                motions = random.choices(motions, k=num_sample)
            elif method == "top":
                motions = motions[:num_sample]
            else:
                raise NotImplementedError(method)
        out.append(motions)
    return out


@dataclasses.dataclass
class EnvConfig:
    project_dir: str
    fps_sim: int
    fps_con: int
    add_noise: bool
    verbose: bool

    # character (single agent)
    char_info_file: str
    sim_char_file: str
    base_motion_file: str
    ref_motion_files: list
    ref_motion_scale: float
    ref_motion_height_fix: float
    actuation: str
    self_collision: bool
    matmul_bf16: bool
    apgd_iters: int

    # state
    state_choices: list
    state_body_type: str
    sensor_lookahead: list

    # action
    action_type: str
    action_range_min: float
    action_range_max: float
    action_range_min_pol: float
    action_range_max_pol: float
    action_apply_clamp: bool
    # residual root-wrench action spaces (envs/env_humanoid_base.py:217-279)
    use_base_residual_linear_force: bool
    base_residual_linear_force_frame: str
    use_base_residual_angular_force: bool
    base_residual_angular_force_frame: str
    range_min_linear_force: list
    range_max_linear_force: list
    range_min_pol_linear_force: list
    range_max_pol_linear_force: list
    range_min_angular_force: list
    range_max_angular_force: list
    range_min_pol_angular_force: list
    range_max_pol_angular_force: list

    # reward
    reward_fn_def: dict
    reward_fn_name: str

    # early termination
    early_term_choices: list
    et_low_reward_thres: float
    et_low_reward_duration: float
    et_sim_window_time: float
    et_eoe_margin: float
    et_root_mismatch_orientation_thres: float
    et_root_mismatch_position_thres: float
    et_falldown_height_min: float
    falldown_method: str

    ground_enable: bool
    ground_height_map: Optional[str]  # image path (env_humanoid_tracking.py:78)
    ground_size: list                 # [sx, sz, sy] extent (:79)
    start_time_sampler: str
    repeat_ref_motion: bool
    contactable_body: list  # overrides char-info contact_allow_map

    # Obstacle perturbation (sim_obstacle.py throw params; our extension
    # adds random auto-throws during training — the reference triggers
    # throw_obstacle externally, envs/env_humanoid_base.py:363-366)
    obstacle_num_slots: int
    obstacle_throw_interval: float  # mean seconds between throws, 0 = manual
    obstacle_shape: str             # box | sphere
    obstacle_vel: float
    obstacle_ttl: float
    obstacle_mass: float

    raw: dict


def parse_env_config(cfg: dict, project_dir: Optional[str] = None) -> EnvConfig:
    """Parse the reference env_config dict (spec["config"]["env_config"])."""
    project_dir = project_dir or cfg.get("project_dir", ".")

    char = cfg["character"]

    def first(x, default=None):
        if x is None:
            return default
        if isinstance(x, (list, tuple)):
            return x[0] if len(x) else default
        return x

    ref_db = first(char.get("ref_motion_db"), {}) or {}
    ref_files = collect_motion_files(project_dir, [ref_db])[0]

    physics = first(char.get("physics"), {}) or {}
    ground = cfg.get("ground", {}) or {}
    falldown = ground.get("falldown_check", {}) or {}
    state = cfg.get("state", {}) or {}
    action = cfg.get("action", {}) or {}
    reward = cfg.get("reward", {}) or {}
    et = cfg.get("early_term", {}) or {}
    obstacle = cfg.get("obstacle", {}) or {}

    fn_map = reward.get("fn_map", ["default"])
    fn_name = first(fn_map, "default")

    return EnvConfig(
        project_dir=project_dir,
        fps_sim=int(cfg.get("fps_sim", 480)),
        fps_con=int(cfg.get("fps_con", 30)),
        add_noise=bool(cfg.get("add_noise", False)),
        verbose=bool(cfg.get("verbose", False)),
        char_info_file=os.path.join(project_dir,
                                    first(char["char_info_module"])),
        sim_char_file=os.path.join(project_dir, first(char["sim_char_file"])),
        base_motion_file=os.path.join(project_dir,
                                      first(char["base_motion_file"])),
        ref_motion_files=ref_files,
        ref_motion_scale=float(first(char.get("ref_motion_scale"), 1.0)),
        ref_motion_height_fix=float(
            first(char.get("ref_motion_height_fix"), 0.0)),
        actuation=physics.get("actuation", "spd"),
        self_collision=bool(physics.get("self_collision", True)),
        matmul_bf16=bool(physics.get("matmul_bf16", True)),
        apgd_iters=int(physics.get("apgd_iters", 16)),
        state_choices=list(state.get("choices", ["body", "ref_motion_abs"])),
        state_body_type=state.get("body_type", "facing_R6_h"),
        sensor_lookahead=list(state.get("sensor_lookahead", [0.05, 0.15])),
        action_type=action.get("type", "absolute"),
        action_range_min=float(action.get("range_min", -3.0)),
        action_range_max=float(action.get("range_max", 3.0)),
        action_range_min_pol=float(action.get("range_min_pol", -3.0)),
        action_range_max_pol=float(action.get("range_max_pol", 3.0)),
        action_apply_clamp=bool(action.get("apply_clamp", True)),
        use_base_residual_linear_force=bool(
            action.get("use_base_residual_linear_force", False)),
        base_residual_linear_force_frame=action.get(
            "base_residual_linear_force_frame", "base"),
        use_base_residual_angular_force=bool(
            action.get("use_base_residual_angular_force", False)),
        base_residual_angular_force_frame=action.get(
            "base_residual_angular_force_frame", "base"),
        range_min_linear_force=list(
            action.get("range_min_linear_force", [-100.0] * 3)),
        range_max_linear_force=list(
            action.get("range_max_linear_force", [100.0] * 3)),
        range_min_pol_linear_force=list(
            action.get("range_min_pol_linear_force", [-3.0] * 3)),
        range_max_pol_linear_force=list(
            action.get("range_max_pol_linear_force", [3.0] * 3)),
        range_min_angular_force=list(
            action.get("range_min_angular_force", [-100.0] * 3)),
        range_max_angular_force=list(
            action.get("range_max_angular_force", [100.0] * 3)),
        range_min_pol_angular_force=list(
            action.get("range_min_pol_angular_force", [-3.0] * 3)),
        range_max_pol_angular_force=list(
            action.get("range_max_pol_angular_force", [3.0] * 3)),
        reward_fn_def=reward.get("fn_def", {}).get(fn_name, _DEFAULT_REWARD),
        reward_fn_name=fn_name,
        early_term_choices=list(et.get("choices", ["ref_motion_end"])),
        et_low_reward_thres=float(et.get("low_reward_thres", 0.1)),
        et_low_reward_duration=float(et.get("low_reward_duration", 1.0)),
        et_sim_window_time=float(et.get("sim_window_time", 1e9)),
        et_eoe_margin=float(et.get("eoe_margin", 0.0)),
        et_root_mismatch_orientation_thres=float(
            et.get("root_mismatch_orientation_thres", 1.0472)),
        et_root_mismatch_position_thres=float(
            et.get("root_mismatch_position_thres", 0.5)),
        et_falldown_height_min=float(falldown.get("height_min", 0.3)),
        falldown_method=falldown.get("method", "height"),
        ground_enable=bool(ground.get("enable", True)),
        ground_height_map=(
            os.path.join(project_dir, ground["height_map"])
            if ground.get("height_map") else None),
        ground_size=list(ground.get("size", [100.0, 100.0, 10.0])),
        contactable_body=list(
            first(char.get("contactable_body"), None) or []),
        start_time_sampler=cfg.get("start_time_sampler", "uniform"),
        repeat_ref_motion=bool(cfg.get("repeat_ref_motion", False)),
        obstacle_num_slots=int(obstacle.get("num_slots", 0)),
        obstacle_throw_interval=float(obstacle.get("throw_interval", 0.0)),
        obstacle_shape=obstacle.get("shape", "box"),
        obstacle_vel=float(obstacle.get("vel", 8.0)),
        obstacle_ttl=float(obstacle.get("ttl", 2.0)),
        obstacle_mass=float(obstacle.get("mass", 2.0)),
        raw=cfg,
    )


_DEFAULT_REWARD = {
    "name": "total", "op": "mul", "child_nodes": [
        {"name": "pose_pos", "op": "leaf", "weight": 1.0,
         "kernel": {"type": "gaussian", "scale": 40.0}},
        {"name": "pose_vel", "op": "leaf", "weight": 1.0,
         "kernel": {"type": "gaussian", "scale": 1.0}},
        {"name": "ee", "op": "leaf", "weight": 1.0,
         "kernel": {"type": "gaussian", "scale": 10.0}},
        {"name": "root", "op": "leaf", "weight": 1.0,
         "kernel": {"type": "gaussian", "scale": 2.5}},
        {"name": "com", "op": "leaf", "weight": 1.0,
         "kernel": {"type": "gaussian", "scale": 2.5}},
    ],
}


def load_env_config_from_spec(spec_path: str,
                              project_dir: Optional[str] = None) -> EnvConfig:
    spec = load_spec(spec_path)
    cfg = spec["config"]["env_config"]
    return parse_env_config(cfg, project_dir=project_dir)
