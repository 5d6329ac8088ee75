"""Pose/velocity noise injection for resets.

Replaces add_noise_to_pose_vel (envs/env_humanoid_tracking.py:440-486) +
fairmotion truncnorm / random_rotation: random rotation perturbation per
movable joint and truncated-normal angular-velocity noise, fully vectorized.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..maths import quaternion as quat
from ..physics.model import PhysicsModel


def truncnorm(rng, shape, mu=0.0, sigma=0.1, lower=-0.5, upper=0.5):
    """Truncated normal via inverse-CDF (replaces fairmotion math.truncnorm)."""
    a = (lower - mu) / jnp.maximum(sigma, 1e-8)
    b = (upper - mu) / jnp.maximum(sigma, 1e-8)
    u = jax.random.truncated_normal(rng, a, b, shape)
    return mu + sigma * u


def random_rotation(rng, shape, mu_theta=0.0, sigma_theta=0.1,
                    lower_theta=-0.5, upper_theta=0.5):
    """Random axis + truncated-normal angle (fairmotion math.random_rotation)."""
    k1, k2 = jax.random.split(rng)
    axis = jax.random.normal(k1, shape + (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True),
                              1e-8)
    theta = truncnorm(k2, shape, mu_theta, sigma_theta, lower_theta,
                      upper_theta)
    return quat.from_axis_angle(axis * theta[..., None])


def add_noise_to_pose_vel(model: PhysicsModel, rng, joint_q, joint_w,
                          sigma_pose=0.1, bound_pose=0.5,
                          sigma_vel=0.1, bound_vel=0.5):
    """Perturb local joint rotations (right-multiplied dR) and angular
    velocities of movable joints (fixed joints untouched)."""
    k1, k2 = jax.random.split(rng)
    J = model.num_joints
    shape = joint_q.shape[:-2] + (J,)
    dq = random_rotation(k1, shape, 0.0, sigma_pose, -bound_pose, bound_pose)
    movable = jnp.asarray(model.movable)[:, None]
    new_q = quat.mul(joint_q, dq)
    new_q = jnp.where(movable, new_q, joint_q)
    dw = truncnorm(k2, shape + (3,), 0.0, sigma_vel, -bound_vel, bound_vel)
    new_w = jnp.where(movable, joint_w + dw, joint_w)
    return new_q, new_w
