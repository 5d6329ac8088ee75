"""Minimal char-info for the 4-link chain self-collision fixture."""
import numpy as np

name = "chain4"
v_up = np.array([0.0, 1.0, 0.0])
v_face = np.array([0.0, 0.0, 1.0])
v_up_env = np.array([0.0, 1.0, 0.0])

ROOT = -1
seg1 = 0
seg2 = 1
seg3 = 2
joint_name = {ROOT: "base", seg1: "seg1", seg2: "seg2", seg3: "seg3"}
bvh_map = {ROOT: None, seg1: None, seg2: None, seg3: None}
dof = {seg1: 3, seg2: 3, seg3: 3}
kp = {seg1: 30.0, seg2: 30.0, seg3: 30.0}
kd = {seg1: 3.0, seg2: 3.0, seg3: 3.0}
cpd_ratio = 1.0
max_force = {seg1: 50.0, seg2: 50.0, seg3: 50.0}
contact_allow_map = {ROOT: True, seg1: True, seg2: True, seg3: True}
joint_weight = {ROOT: 0.0, seg1: 1.0, seg2: 1.0, seg3: 1.0}
collison_ignore_pairs = []
end_effector_indices = [seg3]
friction_lateral = 0.8
