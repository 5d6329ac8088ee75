"""Rigid transforms and facing-frame helpers.

A transform is represented as a (quaternion xyzw, position) pair instead of a
4x4 matrix — cheaper to compose and rotate on the VPU, and what the physics
state stores natively.  Replaces fairmotion conversions.T2Rp/Rp2T/Qp2T usage
(reference: sim_agent.py:310-342, envs/env_humanoid_base.py:786).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import quaternion as quat

_EPS = 1e-8


def compose(qa, pa, qb, pb):
    """(qa,pa) ∘ (qb,pb): apply b then a."""
    return quat.mul(qa, qb), pa + quat.rotate(qa, pb)


def inverse(q, p):
    qi = quat.conjugate(q)
    return qi, -quat.rotate(qi, p)


def apply(q, p, v):
    """Transform point v by (q, p)."""
    return quat.rotate(q, v) + p


def project_on_vector(v, u):
    """Projection of v onto unit-ish vector u (fairmotion math.projectionOnVector)."""
    return (jnp.sum(v * u, axis=-1, keepdims=True) /
            jnp.maximum(jnp.sum(u * u, axis=-1, keepdims=True), _EPS)) * u


def facing_frame(root_q, root_p, v_face, v_up_env, ground_height=0.0):
    """Facing frame of a character (reference sim_agent.py:310-342).

    Returns (R_face (...,3,3), p_face (...,3)).  Column convention matches the
    reference: x = up × face, y = v_up_env, z = facing dir.
    """
    d = quat.rotate(root_q, jnp.broadcast_to(v_face, root_q.shape[:-1] + (3,)))
    d = d - project_on_vector(d, v_up_env)
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    # Degenerate case (facing ∥ up): deterministic fallback along env ax1.
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), d.shape)
    d = jnp.where(norm < 1e-6, fallback, d / jnp.maximum(norm, _EPS))
    p = root_p - project_on_vector(root_p, v_up_env)
    p = p + ground_height * v_up_env
    y = jnp.broadcast_to(v_up_env, d.shape)
    x = jnp.cross(y, d)
    R = jnp.stack([x, y, d], axis=-1)  # columns
    return R, p


def facing_dir_pos(root_q, root_p, v_face, v_up_env, ground_height=0.0):
    R, p = facing_frame(root_q, root_p, v_face, v_up_env, ground_height)
    return R[..., :, 2], p
