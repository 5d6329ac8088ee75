"""Obstacle-character contacts through the unified APGD solve (VERDICT r2
item 7): momentum conservation and real box narrow phase (no bounding-sphere
corners)."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsvae_tpu.kinematics.char_info import load_char_info
from physicsvae_tpu.kinematics.urdf import load_urdf
from physicsvae_tpu.maths import quaternion as quat
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import obstacles as obs_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics import step as step_mod

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


@pytest.fixture(scope="module")
def cube():
    cm = load_urdf(os.path.join(ASSETS, "cube.urdf"))
    ci = load_char_info(os.path.join(ASSETS, "cube_char_info.py"))
    # f32 everywhere: the conservation assertion is tight
    return model_mod.build_model(
        cm, ci, model_mod.SimParams(matmul_bf16=False))


def _pool_with(pos, vel, radius=0.15, mass=2.0, shape=obs_mod.SHAPE_SPHERE,
               half=None):
    pool = obs_mod.init_pool(2)
    half = np.full(3, radius) if half is None else np.asarray(half)
    return dataclasses.replace(
        pool,
        pos=pool.pos.at[0].set(jnp.asarray(pos)),
        vel=pool.vel.at[0].set(jnp.asarray(vel)),
        radius=pool.radius.at[0].set(radius),
        half_extents=pool.half_extents.at[0].set(jnp.asarray(half)),
        shape=pool.shape.at[0].set(shape),
        mass=pool.mass.at[0].set(mass),
        ttl=pool.ttl.at[0].set(5.0),
    )


def test_obstacle_strike_conserves_momentum(cube):
    """Sphere obstacle hits a free-floating cube mid-air: total horizontal
    momentum of (cube + obstacle) is conserved through a control step."""
    model = cube
    st = state_mod.from_pose(model, jnp.asarray([0.0, 5.0, 0.0]),
                             jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                             quat.identity((model.num_joints,)))
    m_o = 2.0
    # obstacle just outside, flying in along +x
    pool = _pool_with(pos=[-0.4, 5.0, 0.0], vel=[6.0, 0.0, 0.0], mass=m_o)
    action = step_mod.hold_action(model)

    m_c = model.total_mass
    p0 = m_o * 6.0  # cube at rest

    st2, pool2 = st, pool
    for _ in range(3):  # strike lands during step 2
        st2, pool2 = step_mod.control_step(model, st2, action,
                                           obstacles=pool2)
    k2 = fk_mod.fk(model, st2)
    m = jnp.asarray(model.mass)
    p_char = float(jnp.sum(m[:, None] * k2.body_vcom, axis=-2)[0])
    p_obs = float(pool2.vel[0, 0] * m_o)
    # struck: obstacle slowed, cube moving
    assert p_char > 0.05 * p0, (p_char, p0)
    assert abs(p_char + p_obs - p0) < 0.01 * p0, (p_char, p_obs, p0)


def test_box_narrow_phase_beats_bounding_sphere(cube):
    """An elongated box's face can touch where its bounding sphere cannot:
    the SDF narrow phase reports contact with a face-aligned normal."""
    model = cube
    st = state_mod.from_pose(model, jnp.asarray([0.0, 5.0, 0.0]),
                             jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                             quat.identity((model.num_joints,)))
    k = fk_mod.fk(model, st)
    # cube_char candidate points are the 8 corners of a box around the
    # root; place an elongated box so its +x face overlaps the -x corners
    # but the mean-half-extent bounding sphere (r=0.166) would not reach.
    xmin = float(jnp.min(fk_mod.contact_point_positions(model, k)[0][..., 0]))
    half = [0.45, 0.2, 0.2]
    # +x face 0.01 past the corner points (their margin radius is 0)
    pool = _pool_with(pos=[xmin - 0.44, 5.0, 0.0], vel=[0.0] * 3,
                      shape=obs_mod.SHAPE_BOX, half=half)
    oc = obs_mod.detect_obstacle_contacts(model, pool, k)
    assert bool(oc.active[0])  # face contact found
    # push direction on the character: +x (away from the box face)
    np.testing.assert_allclose(np.asarray(oc.normal[0]), [1.0, 0.0, 0.0],
                               atol=1e-5)
    # bounding sphere of the same box misses by a wide margin
    dist_center = abs(xmin - (xmin - 0.47))
    assert dist_center - np.mean(half) > float(
        jnp.max(jnp.asarray(model.point_radius)))


def test_sphere_inside_region_normal_sane(cube):
    """Deep penetration (point inside the box) still produces a unit
    face normal, not NaN."""
    model = cube
    st = state_mod.from_pose(model, jnp.asarray([0.0, 5.0, 0.0]),
                             jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                             quat.identity((model.num_joints,)))
    k = fk_mod.fk(model, st)
    pool = _pool_with(pos=[0.0, 5.0, 0.0], vel=[0.0] * 3,
                      shape=obs_mod.SHAPE_BOX, half=[0.6, 0.6, 0.6])
    oc = obs_mod.detect_obstacle_contacts(model, pool, k)
    n = np.asarray(oc.normal[0])
    assert np.isfinite(n).all()
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-5)
