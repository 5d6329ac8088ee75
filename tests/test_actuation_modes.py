"""Actuation-mode coverage: torque control and residual root wrench
(reference SimAgent.Actuation TQ + applyExternalForce/Torque paths,
sim_agent.py:566-779)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics import step as step_mod
from physicsvae_tpu.kinematics import motion as motion_mod
from physicsvae_tpu.kinematics.char_info import load_char_info
from physicsvae_tpu.maths import quaternion as quat

CHAR_INFO = "/root/reference/data/character/info/loco_char_info.py"
BVH_HIER = "/root/reference/data/motion/loco/loco_hierarchy.bvh"


@pytest.fixture(scope="module")
def setup():
    model = model_mod.load_loco_model(
        params=model_mod.SimParams(self_collision=False))
    char = load_char_info(CHAR_INFO)
    m = motion_mod.from_bvh_file(BVH_HIER, char)
    root_p, root_q, joint_q = motion_mod.pose_at_time(m, 0.0)
    st = state_mod.from_pose(model, root_p.at[1].set(3.0), root_q, joint_q)
    return model, st, joint_q


def test_residual_root_force_counters_gravity(setup):
    """A world-frame +up root force equal to total weight makes the root
    hover (residual linear force path, sim_agent.py:582-597)."""
    model, st, joint_q = setup
    weight = model.total_mass * 9.8
    action = step_mod.Action(
        target_q=joint_q,
        target_w=jnp.zeros((model.num_joints, 3)),
        root_force=jnp.asarray([0.0, weight, 0.0]))

    st2 = step_mod.control_step(model, st, action)
    # root vertical velocity stays ~0 under perfect compensation
    assert abs(float(st2.vel[1])) < 0.25

    # without the force it free-falls: v_y ≈ -g*dt_con
    st3 = step_mod.control_step(
        model, st,
        step_mod.Action(target_q=joint_q,
                        target_w=jnp.zeros((model.num_joints, 3))))
    assert float(st3.vel[1]) < -0.25


def test_residual_root_torque_spins(setup):
    model, st, joint_q = setup
    action = step_mod.Action(
        target_q=joint_q,
        target_w=jnp.zeros((model.num_joints, 3)),
        root_torque=jnp.asarray([0.0, 50.0, 0.0]))
    st2 = step_mod.control_step(model, st, action)
    assert float(st2.vel[4]) > 0.05  # angular velocity about up-axis


def test_direct_torque_mode(setup):
    """TQ actuation: zero targets + direct joint torques move the joints
    (kp/kd act toward target; use torque-only by zeroing gains via targets
    equal to current pose and zero velocity error)."""
    model, st, joint_q = setup
    tau = jnp.zeros(model.nv)
    # constant torque on the first movable joint's dofs
    tau = tau.at[6:9].set(jnp.asarray([30.0, 0.0, 0.0]))
    action = step_mod.Action(
        target_q=st.joint_q,  # PD error starts at zero
        target_w=jnp.zeros((model.num_joints, 3)),
        torque=tau)
    st2 = step_mod.control_step(model, st, action)
    om = state_mod.joint_omega(model, st2)
    j0 = int(np.where(model.movable)[0][0])
    assert abs(float(om[j0, 0])) > 0.01
