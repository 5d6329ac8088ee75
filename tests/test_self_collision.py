"""Self-collision narrow phase + impulse response."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics import step as step_mod
from physicsvae_tpu.physics.self_collision import (detect_self_contacts,
                                                   segment_closest_points)
from physicsvae_tpu.kinematics.char_info import load_char_info
from physicsvae_tpu.kinematics import motion as motion_mod
from physicsvae_tpu.maths import quaternion as quat

CHAR_INFO = "/root/reference/data/character/info/loco_char_info.py"
BVH_HIER = "/root/reference/data/motion/loco/loco_hierarchy.bvh"


@pytest.fixture(scope="module")
def model():
    return model_mod.load_loco_model()


@pytest.fixture(scope="module")
def char():
    return load_char_info(CHAR_INFO)


def test_segment_closest_points():
    # parallel separated
    x1, x2 = segment_closest_points(
        jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 0, 0]),
        jnp.asarray([0.0, 1, 0]), jnp.asarray([1.0, 1, 0]))
    assert np.isclose(float(jnp.linalg.norm(x1 - x2)), 1.0, atol=1e-6)
    # crossing perpendicular
    x1, x2 = segment_closest_points(
        jnp.asarray([-1.0, 0, 0]), jnp.asarray([1.0, 0, 0]),
        jnp.asarray([0.0, -1, 0.5]), jnp.asarray([0.0, 1, 0.5]))
    assert np.allclose(np.asarray(x1), [0, 0, 0], atol=1e-6)
    assert np.allclose(np.asarray(x2), [0, 0, 0.5], atol=1e-6)
    # degenerate: point vs segment
    x1, x2 = segment_closest_points(
        jnp.asarray([0.0, 0, 0]), jnp.asarray([0.0, 0, 0]),
        jnp.asarray([-1.0, 1, 0]), jnp.asarray([1.0, 1, 0]))
    assert np.allclose(np.asarray(x2), [0, 1, 0], atol=1e-6)


def test_pair_list_excludes_adjacent_and_ignored(model):
    pairs = {tuple(p) for p in np.asarray(model.self_pairs)}
    # parent-child pairs excluded
    for b in range(1, model.num_bodies):
        par = int(model.body_parent[b])
        assert tuple(sorted((par, b))) not in pairs
    # ignore pairs excluded (LHipJoint=0, RHipJoint=5 -> bodies 1, 6)
    assert (1, 6) not in pairs


def test_tpose_no_self_penetration(model, char):
    from tests.test_step import tpose_state
    st, _ = tpose_state(model, char, height=1.0)
    k = fk_mod.fk(model, st)
    _, _, depth, _, _ = detect_self_contacts(model, k)
    assert float(depth.max()) < 0.02


def _arm_into_spine_pose(model, char):
    """LeftArm folded -2.5 rad about z: its capsule overlaps the Spine
    capsule by ~8 cm (found by pose scan)."""
    m = motion_mod.from_bvh_file(BVH_HIER, char)
    root_p, root_q, joint_q = motion_mod.pose_at_time(m, 0.0)
    larm = char.joint_names.index("LeftArm")
    bend = quat.from_axis_angle(jnp.asarray([0.0, 0.0, -2.5]))
    joint_q = joint_q.at[larm].set(quat.mul(joint_q[larm], bend))
    return state_mod.from_pose(model, root_p.at[1].set(2.0), root_q,
                               joint_q), joint_q


def test_arm_into_spine_detected(model, char):
    st, _ = _arm_into_spine_pose(model, char)
    k = fk_mod.fk(model, st)
    _, _, depth, bi, bj = detect_self_contacts(model, k)
    assert float(depth.max()) > 0.03, "folded arm should self-collide"


def test_self_collision_impulse_resists_penetration(model, char):
    """Holding the overlapping pose as the SPD target: with self-collision
    ON the contact impulse opposes it (arm pushed off the spine); with it OFF
    the arm sinks straight in.  Zero-gravity so only the self contact acts."""
    p_on = model_mod.SimParams(gravity=0.0, self_collision=True)
    p_off = model_mod.SimParams(gravity=0.0, self_collision=False)
    m_on = model_mod.load_loco_model(params=p_on)
    m_off = model_mod.load_loco_model(params=p_off)

    def run(mdl):
        st, target_q = _arm_into_spine_pose(mdl, char)
        action = step_mod.Action(target_q=target_q,
                                 target_w=jnp.zeros((mdl.num_joints, 3)))

        @jax.jit
        def roll(st):
            def body(s, _):
                return step_mod.control_step(mdl, s, action), None
            return jax.lax.scan(body, st, None, length=5)[0]

        end = roll(st)
        k = fk_mod.fk(mdl, end)
        _, _, depth, _, _ = detect_self_contacts(mdl, k)
        return float(depth.max())

    d_on = run(m_on)
    d_off = run(m_off)
    assert d_on < d_off - 0.01, (d_on, d_off)
    assert d_on < 0.05, d_on


def test_standing_still_works_with_self_collision(model, char):
    """The combined ground+self contact solve must not break standing."""
    from tests.test_step import tpose_state
    st, (root_p, root_q, joint_q) = tpose_state(model, char, height=0.95)
    action = step_mod.Action(target_q=joint_q,
                             target_w=jnp.zeros((model.num_joints, 3)))

    @jax.jit
    def roll(st):
        def body(s, _):
            s = step_mod.control_step(model, s, action)
            return s, s.root_p[1]
        return jax.lax.scan(body, st, None, length=10)

    end, h = roll(st)
    assert float(np.asarray(h).min()) > 0.6, np.asarray(h)
