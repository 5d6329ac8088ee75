"""Physics-core unit tests: analytic checks per SURVEY.md §4 item (2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.physics import dynamics as dyn_mod
from physicsvae_tpu.maths import quaternion as quat


@pytest.fixture(scope="module")
def model():
    return model_mod.load_loco_model()


def random_state(model, rng, vel_scale=0.0):
    root_p = jnp.asarray(rng.normal(size=3) + np.array([0, 2.0, 0]))
    root_q = quat.normalize(jnp.asarray(rng.normal(size=4)))
    joint_q = quat.normalize(jnp.asarray(rng.normal(size=(model.num_joints, 4))))
    # fixed joints must stay identity
    fixed = ~np.asarray(model.movable)
    joint_q = joint_q.at[fixed].set(jnp.array([0.0, 0, 0, 1]))
    st = state_mod.from_pose(model, root_p, root_q, joint_q)
    if vel_scale > 0:
        st = state_mod.SimState(
            st.root_p, st.root_q, st.joint_q,
            jnp.asarray(rng.normal(size=model.nv) * vel_scale))
    return st


def test_model_shapes(model):
    assert model.nv == 60
    assert model.num_bodies == 25
    assert model.action_dim == 54
    assert model.num_points == 75
    assert abs(model.total_mass - 48.5) < 1e-6


def test_fk_translation_invariance(model):
    rng = np.random.default_rng(0)
    st = random_state(model, rng)
    k1 = fk_mod.fk(model, st)
    st2 = state_mod.SimState(st.root_p + 1.0, st.root_q, st.joint_q, st.vel)
    k2 = fk_mod.fk(model, st2)
    assert np.allclose(k2.body_com, np.asarray(k1.body_com) + 1.0, atol=1e-5)


def test_mass_matrix_spd_symmetric(model):
    rng = np.random.default_rng(1)
    st = random_state(model, rng)
    k = fk_mod.fk(model, st)
    S, M, c = dyn_mod.dynamics_terms(model, st, k)
    M = np.asarray(M)
    assert np.allclose(M, M.T, atol=1e-4)
    w = np.linalg.eigvalsh(M)
    assert w.min() > 0.0
    # total mass appears in the linear block
    assert np.allclose(np.diag(M)[:3], model.total_mass, atol=1e-4)


def test_kinetic_energy_matches_fk(model):
    """0.5 v^T M v must equal sum of body KE computed from FK velocities."""
    rng = np.random.default_rng(2)
    st = random_state(model, rng, vel_scale=1.0)
    k = fk_mod.fk(model, st)
    S, M, c = dyn_mod.dynamics_terms(model, st, k)
    ke_M = 0.5 * float(st.vel @ M @ st.vel)
    m = np.asarray(model.mass)
    R = np.asarray(quat.to_matrix(k.body_q))
    I_w = np.einsum("kij,kjl,kml->kim", R, np.asarray(model.inertia), R)
    v = np.asarray(k.body_vcom)
    w = np.asarray(k.body_w)
    ke_fk = 0.5 * np.sum(m * np.sum(v * v, -1)) + \
        0.5 * np.sum(np.einsum("ki,kij,kj->k", w, I_w, w))
    assert np.isclose(ke_M, ke_fk, rtol=1e-4)


def test_free_fall_acceleration(model):
    """With zero applied torque, any static pose accelerates uniformly at g:
    qdd = [0,-9.8,0, 0...0].  Exercises M and c jointly."""
    rng = np.random.default_rng(3)
    for i in range(3):
        st = random_state(model, rng)
        k = fk_mod.fk(model, st)
        S, M, c = dyn_mod.dynamics_terms(model, st, k)
        qdd = np.linalg.solve(np.asarray(M), -np.asarray(c))
        expected = np.zeros(model.nv)
        expected[1] = -9.8
        assert np.allclose(qdd, expected, atol=1e-3), qdd[:8]


def test_momentum_conservation_free_flight(model):
    """Integrate ballistic motion with velocities; angular momentum about the
    COM and linear momentum (mod gravity) must be conserved."""
    rng = np.random.default_rng(4)
    st = random_state(model, rng, vel_scale=0.5)
    dt = 1.0 / 480

    def momentum(st):
        k = fk_mod.fk(model, st)
        m = jnp.asarray(model.mass)
        lin = jnp.sum(m[:, None] * k.body_vcom, axis=0)
        com, _ = fk_mod.com_and_vel(model, k)
        R = quat.to_matrix(k.body_q)
        I_w = jnp.einsum("kij,kjl,kml->kim", R, jnp.asarray(model.inertia), R)
        ang = jnp.sum(
            jnp.cross(k.body_com - com, m[:, None] * k.body_vcom) +
            jnp.einsum("kij,kj->ki", I_w, k.body_w), axis=0)
        return lin, ang

    def substep(st, _):
        k = fk_mod.fk(model, st)
        S, M, c = dyn_mod.dynamics_terms(model, st, k)
        qdd = jnp.linalg.solve(M, -c)
        vel = st.vel + dt * qdd
        om = state_mod.joint_omega(model, state_mod.SimState(
            st.root_p, st.root_q, st.joint_q, vel))
        st = state_mod.SimState(
            root_p=st.root_p + dt * vel[0:3],
            root_q=quat.integrate_world(st.root_q, vel[3:6], dt),
            joint_q=quat.integrate(st.joint_q, om, dt),
            vel=vel)
        return st, None

    lin0, ang0 = momentum(st)
    stT, _ = jax.lax.scan(substep, st, None, length=120)  # 0.25 s
    linT, angT = momentum(stT)
    # linear momentum changes only by m*g*t
    t = 120 * dt
    dlin = np.asarray(linT - lin0)
    assert np.allclose(dlin, [0, -9.8 * model.total_mass * t, 0], atol=0.05)
    assert np.allclose(np.asarray(angT), np.asarray(ang0), atol=0.05)
