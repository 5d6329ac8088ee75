"""Revolute-joint support: 1-dof axis dofs through the same CRBA/RNEA/SPD
machinery (reference handles revolute generically, sim_agent.py:118-129,
:744-766).

The fixture is the fidelity pendulum with its spherical swivel replaced by a
revolute joint about z — the same analytic laws must hold, and motion must
stay locked to the joint axis.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsvae_tpu.kinematics.char_info import load_char_info
from physicsvae_tpu.kinematics.urdf import load_urdf
from physicsvae_tpu.maths import quaternion as quat
from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics import step as step_mod

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


@pytest.fixture(scope="module")
def pendulum_rev():
    cm = load_urdf(os.path.join(ASSETS, "pendulum_rev.urdf"))
    ci = load_char_info(os.path.join(ASSETS, "pendulum_rev_char_info.py"))
    return model_mod.build_model(cm, ci, model_mod.SimParams())


def _hold(model):
    return step_mod.Action(
        target_q=quat.identity((model.num_joints,)),
        target_w=jnp.zeros((model.num_joints, 3)),
        root_force=jnp.asarray([0.0, 9.8 * model.total_mass, 0.0]))


def test_dof_tables(pendulum_rev):
    m = pendulum_rev
    assert m.nv == 7
    assert int(m.joint_ndof[0]) == 1
    np.testing.assert_allclose(np.asarray(m.dof_axis_local[6]), [0, 0, 1])
    assert m.mov_dof_T.shape == (1, 1, 3)


def test_revolute_pendulum_period(pendulum_rev):
    """Same analytic period as the spherical fixture: the revolute axis z
    is normal to the swing plane."""
    model = pendulum_rev
    theta0 = 0.1
    jq = quat.identity((model.num_joints,)).at[0].set(
        quat.from_axis_angle(jnp.asarray([0.0, 0.0, theta0])))
    st = state_mod.from_pose(model, jnp.asarray([0.0, 2.0, 0.0]),
                             jnp.asarray([0.0, 0.0, 0.0, 1.0]), jq)
    step = jax.jit(lambda s: step_mod.control_step(model, s, _hold(model)))

    angles = []
    for _ in range(90):
        st = step(st)
        aa = quat.to_axis_angle(st.joint_q[0])
        angles.append(float(aa[2]))
        # motion stays on the axis: x/y components remain ~0
        assert abs(float(aa[0])) < 1e-4 and abs(float(aa[1])) < 1e-4
    angles = np.asarray(angles)

    sign = np.sign(angles)
    crossings = np.where(np.diff(sign) != 0)[0]
    assert len(crossings) >= 3, angles
    half_periods = np.diff(crossings) / 30.0
    T_measured = 2.0 * np.mean(half_periods)
    d, m_rod, I_com = 0.5, 1.0, 0.001
    T_expected = 2 * np.pi * np.sqrt((I_com + m_rod * d * d)
                                     / (m_rod * 9.8 * d))
    assert abs(T_measured - T_expected) / T_expected < 0.03, (
        T_measured, T_expected)


def test_revolute_spd_tracks_target(pendulum_rev):
    """SPD drives the revolute joint to an on-axis target; off-axis target
    components are projected out (project_rotation_1D semantics)."""
    import dataclasses
    model = pendulum_rev
    ci_kp = 300.0
    model = dataclasses.replace(
        model,
        kp=np.where(np.arange(model.nv) >= 6, ci_kp, 0.0),
        kd=np.where(np.arange(model.nv) >= 6, 30.0, 0.0),
        max_force=np.where(np.arange(model.nv) >= 6, 1000.0, 0.0))
    st = state_mod.from_pose(model, jnp.asarray([0.0, 2.0, 0.0]),
                             jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                             quat.identity((model.num_joints,)))
    # target: 0.4 rad about z PLUS an off-axis x component that a revolute
    # joint cannot realize
    tgt = quat.from_axis_angle(jnp.asarray([0.3, 0.0, 0.4]))
    action = step_mod.Action(
        target_q=quat.identity((model.num_joints,)).at[0].set(tgt),
        target_w=jnp.zeros((model.num_joints, 3)),
        root_force=jnp.asarray([0.0, 9.8 * model.total_mass, 0.0]))
    step = jax.jit(lambda s: step_mod.control_step(model, s, action))
    for _ in range(60):
        st = step(st)
    aa = quat.to_axis_angle(st.joint_q[0])
    # converged near the on-axis component (gravity sags it slightly)
    assert 0.2 < float(aa[2]) < 0.55, np.asarray(aa)
    assert abs(float(aa[0])) < 1e-3
