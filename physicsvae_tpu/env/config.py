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
    start_time_sampler: str
    repeat_ref_motion: bool
    contactable_body: list  # overrides char-info contact_allow_map

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
    ref_files = []
    data = ref_db.get("data") or {}
    for f in data.get("file", []) or []:
        ref_files.append(os.path.join(project_dir, f))
    for d in data.get("dir", []) or []:
        full = os.path.join(project_dir, d)
        ref_files += sorted(
            os.path.join(full, f) for f in os.listdir(full)
            if f.endswith(".bvh"))

    physics = first(char.get("physics"), {}) or {}
    ground = cfg.get("ground", {}) or {}
    falldown = ground.get("falldown_check", {}) or {}
    state = cfg.get("state", {}) or {}
    action = cfg.get("action", {}) or {}
    reward = cfg.get("reward", {}) or {}
    et = cfg.get("early_term", {}) or {}

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
        state_choices=list(state.get("choices", ["body", "ref_motion_abs"])),
        state_body_type=state.get("body_type", "facing_R6_h"),
        sensor_lookahead=list(state.get("sensor_lookahead", [0.05, 0.15])),
        action_type=action.get("type", "absolute"),
        action_range_min=float(action.get("range_min", -3.0)),
        action_range_max=float(action.get("range_max", 3.0)),
        action_range_min_pol=float(action.get("range_min_pol", -3.0)),
        action_range_max_pol=float(action.get("range_max_pol", 3.0)),
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
        contactable_body=list(
            first(char.get("contactable_body"), None) or []),
        start_time_sampler=cfg.get("start_time_sampler", "uniform"),
        repeat_ref_motion=bool(cfg.get("repeat_ref_motion", False)),
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
