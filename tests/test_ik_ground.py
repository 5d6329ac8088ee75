import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.physics import model as model_mod, state as state_mod
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.physics.ik import solve_ik
from physicsvae_tpu.env.ground import (Heightmap, check_out_of_ground,
                                       ground_height_at)
from physicsvae_tpu.kinematics import motion as motion_mod
from physicsvae_tpu.kinematics.char_info import load_char_info


@pytest.fixture(scope="module")
def model():
    return model_mod.load_loco_model()


def test_ik_reaches_targets(model):
    char = load_char_info(
        "/root/reference/data/character/info/loco_char_info.py")
    m = motion_mod.from_bvh_file(
        "/root/reference/data/motion/loco/loco_hierarchy.bvh", char)
    root_p, root_q, joint_q = motion_mod.pose_at_time(m, 0.0)
    st = state_mod.from_pose(model, root_p.at[1].set(1.0), root_q, joint_q)

    ee = jnp.asarray(model.end_effectors)
    k0 = fk_mod.fk(model, st)
    start = k0.body_com[ee, :]
    # move hand/feet targets 10 cm toward the body center
    targets = start + jnp.asarray([0.0, -0.05, 0.05])
    st2 = solve_ik(model, st, ee, targets, iterations=30)
    k1 = fk_mod.fk(model, st2)
    err0 = float(jnp.linalg.norm(start - targets, axis=-1).mean())
    err1 = float(jnp.linalg.norm(k1.body_com[ee, :] - targets, axis=-1).mean())
    assert err1 < err0 * 0.3, (err0, err1)
    # root untouched
    assert np.allclose(st2.root_p, st.root_p)


def test_heightmap_bilinear():
    data = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
    hm = Heightmap(data, 2.0, 2.0)
    # corners
    assert np.isclose(float(hm.height_at(-1.0, -1.0)), 0.0)
    assert np.isclose(float(hm.height_at(1.0, 1.0)), 3.0, atol=1e-4)
    # center = mean
    assert np.isclose(float(hm.height_at(0.0, 0.0)), 1.5, atol=1e-4)
    pts = jnp.asarray([[0.0, 0.0], [-1.0, -1.0]])
    h = ground_height_at(pts, hm)
    assert h.shape == (2,)


def test_out_of_ground():
    inside = jnp.asarray([0.0, 1.0, 0.0])
    outside = jnp.asarray([60.0, 1.0, 0.0])
    assert not bool(check_out_of_ground(inside))
    assert bool(check_out_of_ground(outside))


def test_interaction_mesh_samples(model):
    from physicsvae_tpu.physics.fk import interaction_mesh_samples
    from physicsvae_tpu.physics import state as sm, fk as fkm
    st = sm.default_state(model)
    k = fkm.fk(model, st)
    # sample halfway between root (-1) and joint 0; and joint 3 alone (-2)
    samples = [(-1, 0, 0.5), (3, -2, 0.0)]
    pts = interaction_mesh_samples(model, k, samples)
    assert pts.shape == (2, 3)
    expected0 = 0.5 * (np.asarray(k.body_p[0]) + np.asarray(k.body_p[1]))
    assert np.allclose(np.asarray(pts[0]), expected0, atol=1e-6)
    assert np.allclose(np.asarray(pts[1]), np.asarray(k.body_p[4]), atol=1e-6)


def test_drop_on_heightmap_terrain(model):
    """A character dropped over raised terrain must come to rest on the
    terrain surface, not the z=0 plane (heightmap-aware contacts)."""
    from physicsvae_tpu.physics import step as step_mod
    from physicsvae_tpu.kinematics import motion as motion_mod
    from physicsvae_tpu.kinematics.char_info import load_char_info

    # flat plateau at height 0.5 everywhere
    hm = Heightmap(jnp.full((4, 4), 0.5), 100.0, 100.0)
    char = load_char_info(
        "/root/reference/data/character/info/loco_char_info.py")
    m = motion_mod.from_bvh_file(
        "/root/reference/data/motion/loco/loco_hierarchy.bvh", char)
    root_p, root_q, joint_q = motion_mod.pose_at_time(m, 0.0)
    st = state_mod.from_pose(model, root_p.at[1].set(1.6), root_q, joint_q)
    action = step_mod.Action(target_q=joint_q,
                             target_w=jnp.zeros((model.num_joints, 3)))

    @jax.jit
    def roll(st):
        def body(s, _):
            return step_mod.control_step(model, s, action,
                                         ground_height=hm), None
        return jax.lax.scan(body, st, None, length=15)[0]

    end = roll(st)
    k = fk_mod.fk(model, end)
    lowest = float(np.asarray(k.body_com)[:, 1].min())
    # feet rest ON the plateau (0.5), well above the z=0 plane
    assert lowest > 0.40, lowest
    assert np.isfinite(np.asarray(end.vel)).all()
