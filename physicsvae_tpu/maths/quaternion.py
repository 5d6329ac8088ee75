"""Quaternion and rotation math for the TPU-native PhysicsVAE framework.

All quaternions use **xyzw** component order, matching the Bullet convention
the reference relies on (reference: bullet/bullet_utils.py:10-14).  Every
function is pure jax.numpy, shape-polymorphic over leading batch dimensions,
and safe to use inside jit / vmap / scan.

Replaces the fairmotion `conversions` / `quaternion` / `math` surface used
throughout the reference (e.g. envs/env_humanoid_base.py:19-24,
sim_agent.py:12-16).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# ---------------------------------------------------------------------------
# Construction / normalization
# ---------------------------------------------------------------------------

def identity(shape=()) -> jnp.ndarray:
    """Identity quaternion(s) with the given batch shape."""
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def halfspace(q: jnp.ndarray) -> jnp.ndarray:
    """Constrain to the w>=0 halfspace (reference: fairmotion Q_op halfspace,
    used at envs/env_humanoid_base.py:804)."""
    sign = jnp.where(q[..., 3:4] < 0.0, -1.0, 1.0)
    return q * sign


# ---------------------------------------------------------------------------
# Algebra
# ---------------------------------------------------------------------------

def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b (rotation b followed by a), xyzw order."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0])


inverse = conjugate  # unit quaternions


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------

def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> 3x3 rotation matrix (batched)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> quaternion (xyzw), branch-free (Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate solutions, one per largest diagonal element.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) / 2.0
    q0 = jnp.stack([(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0), qw0], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) / 2.0
    q1 = jnp.stack([qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1),
                    (m21 - m12) / (4 * qx1)], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) / 2.0
    q2 = jnp.stack([(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2),
                    (m02 - m20) / (4 * qy2)], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) / 2.0
    q3 = jnp.stack([(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3,
                    (m10 - m01) / (4 * qz3)], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return normalize(q)


def from_axis_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (exponential coordinates) -> quaternion.

    Matches fairmotion conversions.A2Q / Bullet: |a| is the angle, a/|a| the
    axis.  Small-angle-safe via sinc.
    """
    angle = jnp.linalg.norm(a, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(half)/angle, safe at 0: -> 0.5
    k = jnp.where(angle > _EPS, jnp.sin(half) / jnp.maximum(angle, _EPS), 0.5)
    xyz = a * k
    w = jnp.cos(half)
    return jnp.concatenate([xyz, w], axis=-1)


def to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> axis-angle vector (angle in [0, pi], shortest arc).

    Matches PyBullet getAxisAngleFromQuaternion semantics used in rewards
    (envs/env_humanoid_imitation.py:313-314).
    """
    q = halfspace(normalize(q))
    xyz = q[..., :3]
    w = jnp.clip(q[..., 3:4], -1.0, 1.0)
    s = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(s, w)
    axis = xyz / jnp.maximum(s, _EPS)
    return axis * angle


def from_euler_zyx(e: jnp.ndarray) -> jnp.ndarray:
    """BVH-style intrinsic Z-Y-X Euler angles (radians) -> quaternion.

    R = Rz(ez) @ Ry(ey) @ Rx(ex); input e = [ez, ey, ex] in channel order.
    """
    ez, ey, ex = e[..., 0], e[..., 1], e[..., 2]
    cz, sz = jnp.cos(ez / 2), jnp.sin(ez / 2)
    cy, sy = jnp.cos(ey / 2), jnp.sin(ey / 2)
    cx, sx = jnp.cos(ex / 2), jnp.sin(ex / 2)
    return jnp.stack(
        [
            cz * cy * sx - sz * sy * cx,
            cz * sy * cx + sz * cy * sx,
            sz * cy * cx - cz * sy * sx,
            cz * cy * cx + sz * sy * sx,
        ],
        axis=-1,
    )


def to_r6(q: jnp.ndarray) -> jnp.ndarray:
    """First two columns of the rotation matrix, concatenated (6D rotation
    representation used by body_type facing_R6_h,
    reference envs/env_humanoid_base.py:812-816)."""
    m = to_matrix(q)
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


# ---------------------------------------------------------------------------
# Geodesic / interpolation
# ---------------------------------------------------------------------------

def diff(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Difference quaternion d with d*a = b i.e. d = b * a^-1? —

    PyBullet's getDifferenceQuaternion(a, b) returns b "minus" a such that
    a*d == b in Bullet's convention: d = a^-1 * b (local difference).
    """
    return mul(conjugate(a), b)


def geodesic_angle(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle of the relative rotation between a and b, in [0, pi]."""
    d = to_axis_angle(diff(a, b))
    return jnp.linalg.norm(d, axis=-1)


def log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion log map: returns axis-angle/2 would be classic; here we
    return the full rotation vector (= to_axis_angle)."""
    return to_axis_angle(q)


def exp(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector exp map (= from_axis_angle)."""
    return from_axis_angle(v)


def slerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation, jit-safe, handles antipodal sign."""
    a = normalize(a)
    b = normalize(b)
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0.0, -b, b)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == a.ndim - 1 else t
    wa = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    wb = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return normalize(wa * a + wb * b)


def integrate(q: jnp.ndarray, omega_local: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate a unit quaternion by a body-frame angular velocity for dt.

    q_{t+1} = q_t * exp(dt * omega_local)  (omega in the child/joint frame).
    """
    return normalize(mul(q, from_axis_angle(omega_local * dt)))


def integrate_world(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate by a world-frame angular velocity: q' = exp(dt*w) * q."""
    return normalize(mul(from_axis_angle(omega_world * dt), q))
