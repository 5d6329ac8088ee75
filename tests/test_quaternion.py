import numpy as np
import jax.numpy as jnp
import pytest

from physicsvae_tpu.maths import quaternion as quat
from physicsvae_tpu.maths import transforms as tf


def rand_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    return np.asarray(quat.normalize(jnp.asarray(q)))


def test_identity_rotate():
    v = jnp.array([1.0, 2.0, 3.0])
    assert np.allclose(quat.rotate(quat.identity(), v), v)


def test_mul_matches_matrix():
    rng = np.random.default_rng(0)
    a, b = rand_quat(rng, (16,)), rand_quat(rng, (16,))
    m = quat.to_matrix(quat.mul(a, b))
    m2 = jnp.matmul(quat.to_matrix(a), quat.to_matrix(b))
    assert np.allclose(m, m2, atol=1e-5)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, (8,))
    v = rng.normal(size=(8, 3))
    assert np.allclose(
        quat.rotate(q, v), jnp.einsum("bij,bj->bi", quat.to_matrix(q), v), atol=1e-5
    )


def test_from_to_matrix_roundtrip():
    rng = np.random.default_rng(2)
    q = rand_quat(rng, (64,))
    q2 = np.asarray(quat.from_matrix(quat.to_matrix(q)))
    # sign ambiguity
    dot = np.abs(np.sum(q * q2, axis=-1))
    assert np.allclose(dot, 1.0, atol=1e-5)


def test_axis_angle_roundtrip():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(32, 3))
    a = a / np.linalg.norm(a, axis=-1, keepdims=True) * rng.uniform(0, np.pi - 1e-3, (32, 1))
    a2 = np.asarray(quat.to_axis_angle(quat.from_axis_angle(a)))
    assert np.allclose(a, a2, atol=1e-4)


def test_axis_angle_small():
    a = jnp.array([1e-10, 0.0, 0.0])
    q = quat.from_axis_angle(a)
    assert np.allclose(q, [0, 0, 0, 1], atol=1e-8)


def test_euler_zyx():
    # Rz(90deg): x -> y
    q = quat.from_euler_zyx(jnp.array([np.pi / 2, 0.0, 0.0]))
    assert np.allclose(quat.rotate(q, jnp.array([1.0, 0, 0])), [0, 1, 0], atol=1e-6)
    # composition order: R = Rz @ Ry @ Rx
    e = jnp.array([0.3, -0.2, 0.7])
    q = quat.from_euler_zyx(e)
    Rz = quat.to_matrix(quat.from_axis_angle(jnp.array([0, 0, 0.3])))
    Ry = quat.to_matrix(quat.from_axis_angle(jnp.array([0, -0.2, 0])))
    Rx = quat.to_matrix(quat.from_axis_angle(jnp.array([0.7, 0, 0])))
    assert np.allclose(quat.to_matrix(q), Rz @ Ry @ Rx, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    rng = np.random.default_rng(4)
    a, b = rand_quat(rng, (8,)), rand_quat(rng, (8,))
    s0 = np.asarray(quat.slerp(a, b, 0.0))
    s1 = np.asarray(quat.slerp(a, b, 1.0))
    assert np.allclose(np.abs(np.sum(s0 * a, -1)), 1.0, atol=1e-5)
    assert np.allclose(np.abs(np.sum(s1 * b, -1)), 1.0, atol=1e-5)
    # midpoint is equidistant
    sm = quat.slerp(a, b, 0.5)
    d1 = np.asarray(quat.geodesic_angle(jnp.asarray(a), sm))
    d2 = np.asarray(quat.geodesic_angle(sm, jnp.asarray(b)))
    assert np.allclose(d1, d2, atol=1e-4)


def test_integrate_constant_omega():
    q = quat.identity()
    omega = jnp.array([0.0, 0.0, np.pi])  # half turn per second around z
    dt = 0.001
    for _ in range(0):
        pass
    import jax

    def body(q, _):
        return quat.integrate(q, omega, dt), None

    qT, _ = jax.lax.scan(body, q, None, length=1000)
    # After 1s: rotation by pi about z
    assert np.allclose(np.abs(qT), [0, 0, 1, 0], atol=1e-3)


def test_geodesic_diff_matches_pybullet_convention():
    # d = a^-1 * b so that a * d == b
    rng = np.random.default_rng(5)
    a, b = rand_quat(rng, (8,)), rand_quat(rng, (8,))
    d = quat.diff(jnp.asarray(a), jnp.asarray(b))
    b2 = quat.mul(jnp.asarray(a), d)
    assert np.allclose(np.abs(np.sum(np.asarray(b2) * b, -1)), 1.0, atol=1e-5)


def test_facing_frame():
    # Character rotated 90deg about y (up): facing (z-axis) maps to +x... v_face=z
    v_face = jnp.array([0.0, 0.0, 1.0])
    v_up = jnp.array([0.0, 1.0, 0.0])
    q = quat.from_axis_angle(jnp.array([0.0, np.pi / 2, 0.0]))
    p = jnp.array([1.0, 1.7, 2.0])
    R, pf = tf.facing_frame(q, p, v_face, v_up)
    assert np.allclose(R[:, 2], [1, 0, 0], atol=1e-6)  # facing dir
    assert np.allclose(R[:, 1], [0, 1, 0], atol=1e-6)
    assert np.allclose(pf, [1.0, 0.0, 2.0], atol=1e-6)  # projected to ground
    # rotation matrix validity
    assert np.allclose(np.asarray(R) @ np.asarray(R).T, np.eye(3), atol=1e-6)


def test_r6():
    rng = np.random.default_rng(6)
    q = rand_quat(rng, (4,))
    r6 = np.asarray(quat.to_r6(jnp.asarray(q)))
    m = np.asarray(quat.to_matrix(jnp.asarray(q)))
    assert np.allclose(r6[:, :3], m[:, :, 0], atol=1e-6)
    assert np.allclose(r6[:, 3:], m[:, :, 1], atol=1e-6)
