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


@pytest.mark.parametrize("mode", ["pd", "cpd", "cp", "v"])
def test_explicit_and_constraint_modes_move_joints(mode, setup):
    """PD / CPD / CP drive a joint toward a rotated target; V drives joint
    velocity toward a target angular velocity (SimAgent.Actuation dispatch,
    sim_agent.py:695-766; explicit PD via bullet_utils.py:228-263)."""
    import dataclasses
    _, st, joint_q = setup
    model = model_mod.load_loco_model(
        params=model_mod.SimParams(self_collision=False, actuation=mode))
    if mode == "pd":
        # Explicit PD is only stable with gains tuned for it — loco's
        # char-info ships only the spd set (kp['pd'] would be separate,
        # sim_agent.py:177-179), so scale down as a pd-tuned character would.
        model = dataclasses.replace(model, kp_pd=model.kp_pd * 0.1,
                                    kd_pd=model.kd_pd * 0.02)
    j0 = int(np.where(model.movable)[0][0])

    if mode == "v":
        tw = jnp.zeros((model.num_joints, 3)).at[j0, 0].set(5.0)
        action = step_mod.Action(target_q=st.joint_q, target_w=tw)
    else:
        dq = quat.from_axis_angle(jnp.asarray([0.6, 0.0, 0.0]))
        tq = st.joint_q.at[j0].set(quat.mul(st.joint_q[j0], dq))
        action = step_mod.Action(target_q=tq,
                                 target_w=jnp.zeros((model.num_joints, 3)))

    st2 = st
    for _ in range(3):
        st2 = step_mod.control_step(model, st2, action)
    om = state_mod.joint_omega(model, st2)
    if mode == "v":
        assert float(om[j0, 0]) > 0.05, float(om[j0, 0])
    else:
        err0 = float(quat.geodesic_angle(st.joint_q[j0], action.target_q[j0]))
        err2 = float(quat.geodesic_angle(st2.joint_q[j0], action.target_q[j0]))
        assert err2 < err0, (mode, err0, err2)


def test_residual_wrench_action_space():
    """use_base_residual_linear/angular_force prepend 3+3 action dims with
    their own normalizers (envs/env_humanoid_base.py:217-279, :566-594)."""
    import dataclasses
    from physicsvae_tpu.env import make_env
    from physicsvae_tpu.env.imitation import ImitationEnv

    cfg = make_env("/root/reference/data/spec/loco/loco_imitation.yaml",
                   project_dir="/root/reference").cfg
    cfg2 = dataclasses.replace(
        cfg, use_base_residual_linear_force=True,
        base_residual_linear_force_frame="world",
        use_base_residual_angular_force=True,
        range_min_linear_force=[-800.0] * 3,
        range_max_linear_force=[800.0] * 3,
        early_term_choices=[])
    env = ImitationEnv(cfg2)
    assert env.dim_action == 60

    st = env.reset(jax.random.PRNGKey(0), ref_motion_id=0, start_time=0.5)
    act = env.action_to_targets(st, jnp.zeros(60).at[1].set(3.0))
    # +3.0 policy units on the world-frame up axis -> +800 N
    assert np.allclose(np.asarray(act.root_force), [0.0, 800.0, 0.0],
                       atol=1e-4)
    assert np.allclose(np.asarray(act.root_torque), 0.0, atol=1e-6)


def test_torque_action_space():
    """actuation tq: the pose slot becomes a torque space normalized to
    per-dof max_force (envs/env_humanoid_base.py:232-242)."""
    import dataclasses
    from physicsvae_tpu.env import make_env
    from physicsvae_tpu.env.imitation import ImitationEnv

    cfg = make_env("/root/reference/data/spec/loco/loco_imitation.yaml",
                   project_dir="/root/reference").cfg
    cfg2 = dataclasses.replace(cfg, actuation="tq", early_term_choices=[])
    env = ImitationEnv(cfg2)
    assert env.dim_action == 54

    st = env.reset(jax.random.PRNGKey(0), ref_motion_id=0, start_time=0.5)
    a = jnp.full(54, 3.0)  # max policy value -> +max_force on every dof
    act = env.action_to_targets(st, a)
    assert act.torque is not None
    mf = np.asarray(env.model.max_force)
    assert np.allclose(np.asarray(act.torque)[6:], mf[6:], atol=1e-3)
    assert np.allclose(np.asarray(act.torque)[:6], 0.0)
