"""Integration tests of the full physics step: ball drop, standing balance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.physics import step as step_mod
from physicsvae_tpu.kinematics import motion as motion_mod
from physicsvae_tpu.kinematics.char_info import load_char_info
from physicsvae_tpu.maths import quaternion as quat

BVH_HIER = "/root/reference/data/motion/loco/loco_hierarchy.bvh"
CHAR_INFO = "/root/reference/data/character/info/loco_char_info.py"


@pytest.fixture(scope="module")
def model():
    return model_mod.load_loco_model()


@pytest.fixture(scope="module")
def char():
    return load_char_info(CHAR_INFO)


def tpose_state(model, char, height=1.0):
    m = motion_mod.from_bvh_file(BVH_HIER, char)
    root_p, root_q, joint_q = motion_mod.pose_at_time(m, 0.0)
    root_p = root_p.at[1].set(height)
    return state_mod.from_pose(model, root_p, root_q, joint_q), \
        (root_p, root_q, joint_q)


def test_drop_and_rest(model, char):
    """Dropped from slightly above ground, the character must come to rest ON
    the ground (no tunneling, no explosion)."""
    st, _ = tpose_state(model, char, height=1.0)
    action = step_mod.hold_action(model)

    @jax.jit
    def roll(st):
        def body(s, _):
            return step_mod.control_step(model, s, action), None
        return jax.lax.scan(body, st, None, length=45)[0]  # 1.5 s

    end = roll(st)
    assert np.isfinite(np.asarray(end.vel)).all()
    k = fk_mod.fk(model, end)
    lowest = float(np.asarray(k.body_com)[:, 1].min())
    # resting near ground: nothing deeply below the plane, nothing flying
    assert lowest > -0.10
    assert float(jnp.abs(end.vel).max()) < 8.0
    # root has fallen (it was dropped with no balance controller at T-pose
    # target): height must be below the start
    assert float(end.root_p[1]) < 1.0


def test_spd_tracks_pose_in_air(model, char):
    """With the root pinned by zero gravity & no contacts, SPD must drive the
    joints to the target pose."""
    params = model_mod.SimParams(gravity=0.0)
    m2 = model_mod.load_loco_model(params=params)
    st, (root_p, root_q, joint_q) = tpose_state(m2, char, height=5.0)

    # target: bend every movable joint by a fixed axis-angle
    rng = np.random.default_rng(0)
    delta = quat.from_axis_angle(jnp.asarray(
        rng.normal(size=(m2.num_joints, 3)) * 0.3))
    target = quat.mul(joint_q, delta)
    target = jnp.where(jnp.asarray(m2.movable)[:, None], target,
                       jnp.broadcast_to(jnp.asarray([0., 0, 0, 1]), target.shape))
    action = step_mod.Action(target_q=target,
                             target_w=jnp.zeros((m2.num_joints, 3)))

    @jax.jit
    def roll(st):
        def body(s, _):
            return step_mod.control_step(m2, s, action), None
        return jax.lax.scan(body, st, None, length=30)[0]  # 1 s

    end = roll(st)
    err = np.asarray(quat.geodesic_angle(end.joint_q, target))
    movable = np.asarray(m2.movable)
    assert err[movable].max() < 0.15, err[movable]


def test_standing_under_gravity(model, char):
    """SPD holding the T-pose with feet on the ground: the character should
    not collapse immediately (root stays above 0.5 m for 0.5 s)."""
    st, (root_p, root_q, joint_q) = tpose_state(model, char, height=0.95)
    action = step_mod.Action(target_q=joint_q,
                             target_w=jnp.zeros((model.num_joints, 3)))

    @jax.jit
    def roll(st):
        def body(s, _):
            s = step_mod.control_step(model, s, action)
            return s, s.root_p[1]
        return jax.lax.scan(body, st, None, length=15)

    end, heights = roll(st)
    assert np.isfinite(np.asarray(end.vel)).all()
    assert float(np.asarray(heights).min()) > 0.5, np.asarray(heights)


def test_vmap_batch_of_one_equals_single(model, char):
    st, _ = tpose_state(model, char, height=1.0)
    action = step_mod.hold_action(model)
    single = step_mod.control_step(model, st, action)
    batched_state = jax.tree.map(lambda x: x[None], st)
    batched_action = jax.tree.map(lambda x: x[None], action)
    batched = jax.vmap(lambda s, a: step_mod.control_step(model, s, a))(
        batched_state, batched_action)
    for a, b in zip(jax.tree.leaves(single), jax.tree.leaves(batched)):
        assert np.allclose(np.asarray(a), np.asarray(b)[0], atol=2e-3)
