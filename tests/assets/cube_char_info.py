"""Minimal char-info for the single-box fidelity fixture."""
import numpy as np

name = "cube"
v_up = np.array([0.0, 1.0, 0.0])
v_face = np.array([0.0, 0.0, 1.0])
v_up_env = np.array([0.0, 1.0, 0.0])

ROOT = -1
joint_name = {ROOT: "base"}
bvh_map = {ROOT: None}
dof = {}
kp = {}
kd = {}
cpd_ratio = 1.0
max_force = {}
contact_allow_map = {ROOT: True}
joint_weight = {ROOT: 1.0}
collison_ignore_pairs = []
end_effector_indices = []
friction_lateral = 0.8
