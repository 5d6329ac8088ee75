"""Minimal char-info for the spherical-pendulum fidelity fixture."""
import numpy as np

name = "pendulum"
v_up = np.array([0.0, 1.0, 0.0])
v_face = np.array([0.0, 0.0, 1.0])
v_up_env = np.array([0.0, 1.0, 0.0])

ROOT = -1
rod = 0
joint_name = {ROOT: "base", rod: "rod"}
bvh_map = {ROOT: None, rod: None}
dof = {rod: 1}
kp = {rod: 0.0}
kd = {rod: 0.0}
cpd_ratio = 1.0
max_force = {rod: 0.0}
contact_allow_map = {ROOT: True, rod: True}
joint_weight = {ROOT: 0.0, rod: 1.0}
collison_ignore_pairs = []
end_effector_indices = []
friction_lateral = 0.8
