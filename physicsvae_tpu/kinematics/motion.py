"""Motion arrays: reference-motion database as device-resident tensors.

Replaces fairmotion Motion / MotionWithVelocity / Pose (reference usage:
envs/env_humanoid_base.py:178-205, envs/env_humanoid_imitation.py:46-75,
129-144).  A motion is a fixed-shape stack of frames; `pose_at_time` /
`velocity_at_time` are pure gather+slerp ops usable inside jit, which is what
makes BVH-time interpolation work under vmap (SURVEY.md §7 hard part 5).

Conventions (matching the Bullet-based reference):
  - root_p/root_q: world root transform per frame.
  - joint_q: local joint rotations per *character* joint (xyzw).
  - root velocities world-frame; joint angular velocities in the child joint
    frame (what Bullet's spherical joints consume).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..maths import quaternion as quat
from .bvh import load_bvh
from .char_info import CharInfo


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Motion:
    """Single motion clip in character joint space."""

    root_p: Any      # (T,3)
    root_q: Any      # (T,4)
    joint_q: Any     # (T,J,4)
    root_v: Any      # (T,3) world linear
    root_w: Any      # (T,3) world angular
    joint_w: Any     # (T,J,3) local angular
    fps: float
    num_frames: int

    def tree_flatten(self):
        leaves = (self.root_p, self.root_q, self.joint_q,
                  self.root_v, self.root_w, self.joint_w)
        return leaves, (self.fps, self.num_frames)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, fps=aux[0], num_frames=aux[1])

    @property
    def length(self) -> float:
        return (self.num_frames - 1) / self.fps


def from_bvh_file(path: str, char_info: CharInfo, scale: float = 1.0) -> Motion:
    bvh = load_bvh(path, scale=scale)
    return retarget(bvh, char_info)


def retarget(bvh, char_info: CharInfo) -> Motion:
    """Map BVH joints onto character joints via char_info.bvh_map.

    The reference's characters are authored so URDF joint frames coincide with
    BVH joint frames (reference sim_agent.py:393-447 applies BVH local
    rotations directly as Bullet joint quaternions).
    """
    name_to_idx = {n: i for i, n in enumerate(bvh.skel.joint_names)}
    T = bvh.num_frames
    J = char_info.num_joints

    # Root: world transform of the BVH root joint.
    root_bvh = name_to_idx[char_info.root_bvh_name]
    assert bvh.skel.parents[root_bvh] == -1
    root_p = bvh.root_pos
    root_q = bvh.joint_quat[:, root_bvh]

    joint_q = np.zeros((T, J, 4))
    joint_q[..., 3] = 1.0
    for j in range(J):
        bname = char_info.bvh_map[j]
        if bname is None or bname not in name_to_idx:
            continue
        joint_q[:, j] = bvh.joint_quat[:, name_to_idx[bname]]

    return _with_velocities(root_p, root_q, joint_q, bvh.fps)


def _with_velocities(root_p, root_q, joint_q, fps) -> Motion:
    """Finite-difference velocities, matching MotionWithVelocity semantics
    (frame i velocity from frames (i-1, i); frame 0 copies frame 1).

    Runs pinned to the HOST CPU backend and returns numpy: eager per-clip
    quaternion ops through the TPU tunnel cost a device round-trip each
    (~530 s of a 650 s cold env build in the r3 profile); build_db uploads
    the stacked DB to the accelerator in one transfer afterwards.
    """
    # local_devices, not devices: under multi-host (jax.distributed) the
    # global device list starts with process 0's devices, and pinning to a
    # non-addressable device breaks every other process's env build.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        root_p = jnp.asarray(root_p, dtype=jnp.float32)
        root_q = jnp.asarray(quat.normalize(jnp.asarray(root_q)),
                             dtype=jnp.float32)
        joint_q = jnp.asarray(quat.normalize(jnp.asarray(joint_q)),
                              dtype=jnp.float32)
        T = root_p.shape[0]

        if T > 1:
            root_v = (root_p[1:] - root_p[:-1]) * fps
            # world angular: R_i = exp(w dt) R_{i-1}
            #   -> w = aa(q_i * q_{i-1}^-1)*fps
            dq_root = quat.mul(root_q[1:], quat.conjugate(root_q[:-1]))
            root_w = quat.to_axis_angle(dq_root) * fps
            # local angular in child frame (reference frames (i-1, i))
            dq_j = quat.mul(quat.conjugate(joint_q[:-1]), joint_q[1:])
            joint_w = quat.to_axis_angle(dq_j) * fps
            root_v = jnp.concatenate([root_v[:1], root_v], axis=0)
            root_w = jnp.concatenate([root_w[:1], root_w], axis=0)
            joint_w = jnp.concatenate([joint_w[:1], joint_w], axis=0)
        else:
            root_v = jnp.zeros_like(root_p)
            root_w = jnp.zeros_like(root_p)
            joint_w = jnp.zeros(joint_q.shape[:-1] + (3,))

        return Motion(
            root_p=np.asarray(root_p), root_q=np.asarray(root_q),
            joint_q=np.asarray(joint_q), root_v=np.asarray(root_v),
            root_w=np.asarray(root_w), joint_w=np.asarray(joint_w),
            fps=float(fps), num_frames=int(T),
        )


# ---------------------------------------------------------------------------
# Pose pytree + jit-safe sampling
# ---------------------------------------------------------------------------

def pose_at_time(m: Motion, t):
    """Interpolated pose (root_p, root_q, joint_q) at time t (seconds).

    Pure gather + slerp; `t` may be traced.  Clamps to [0, length].
    """
    f = jnp.clip(t * m.fps, 0.0, m.num_frames - 1.0)
    i0 = jnp.floor(f).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, m.num_frames - 1)
    a = (f - i0)[..., None]
    root_p = (1 - a) * m.root_p[i0] + a * m.root_p[i1]
    root_q = quat.slerp(m.root_q[i0], m.root_q[i1], a)
    aj = a[..., None]
    joint_q = quat.slerp(m.joint_q[i0], m.joint_q[i1], aj)
    return root_p, root_q, joint_q


def velocity_at_time(m: Motion, t):
    """Interpolated (root_v, root_w, joint_w) at time t."""
    f = jnp.clip(t * m.fps, 0.0, m.num_frames - 1.0)
    i0 = jnp.floor(f).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, m.num_frames - 1)
    a = (f - i0)[..., None]
    root_v = (1 - a) * m.root_v[i0] + a * m.root_v[i1]
    root_w = (1 - a) * m.root_w[i0] + a * m.root_w[i1]
    aj = a[..., None]
    joint_w = (1 - aj) * m.joint_w[i0] + aj * m.joint_w[i1]
    return root_v, root_w, joint_w


# ---------------------------------------------------------------------------
# Motion database: stacked clips with per-clip length
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MotionDB:
    """Fixed-shape stack of M clips (padded to the longest)."""

    root_p: Any      # (M,T,3)
    root_q: Any      # (M,T,4)
    joint_q: Any     # (M,T,J,4)
    root_v: Any
    root_w: Any
    joint_w: Any
    num_frames: Any  # (M,) int32 valid frames per clip
    fps: float
    max_frames: int

    def tree_flatten(self):
        leaves = (self.root_p, self.root_q, self.joint_q, self.root_v,
                  self.root_w, self.joint_w, self.num_frames)
        return leaves, (self.fps, self.max_frames)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, fps=aux[0], max_frames=aux[1])

    @property
    def num_clips(self) -> int:
        return self.root_p.shape[0]

    def lengths(self):
        """(M,) clip lengths in seconds."""
        return (self.num_frames - 1) / self.fps

    def clip(self, idx) -> Motion:
        """Select one clip (idx may be traced); num_frames stays padded, so
        use `length_of(idx)` for the true duration."""
        return Motion(
            root_p=self.root_p[idx], root_q=self.root_q[idx],
            joint_q=self.joint_q[idx], root_v=self.root_v[idx],
            root_w=self.root_w[idx], joint_w=self.joint_w[idx],
            fps=self.fps, num_frames=self.max_frames,
        )

    def length_of(self, idx):
        return (self.num_frames[idx] - 1) / self.fps

    def _frame_weights(self, idx, t):
        """(i0, i1, alpha) with t clamped to the clip's true length.

        Direct two-frame addressing: indexing a whole clip first
        (root_p[idx]) would materialize (batch, T, ...) intermediates under
        vmap — gigabytes at B=2048 — so every sample is exactly two gathers.
        """
        nf = self.num_frames[idx]
        f = jnp.clip(t * self.fps, 0.0, (nf - 1).astype(jnp.float32))
        i0 = jnp.floor(f).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, nf - 1)
        return i0, i1, (f - i0)

    def pose_at(self, idx, t):
        """Pose of clip `idx` at time t, clamped to the clip's true length."""
        i0, i1, a = self._frame_weights(idx, t)
        a = a[..., None]
        root_p = (1 - a) * self.root_p[idx, i0] + a * self.root_p[idx, i1]
        root_q = quat.slerp(self.root_q[idx, i0], self.root_q[idx, i1], a)
        aj = a[..., None]
        joint_q = quat.slerp(self.joint_q[idx, i0], self.joint_q[idx, i1], aj)
        return root_p, root_q, joint_q

    def velocity_at(self, idx, t):
        i0, i1, a = self._frame_weights(idx, t)
        a = a[..., None]
        root_v = (1 - a) * self.root_v[idx, i0] + a * self.root_v[idx, i1]
        root_w = (1 - a) * self.root_w[idx, i0] + a * self.root_w[idx, i1]
        aj = a[..., None]
        joint_w = ((1 - aj) * self.joint_w[idx, i0]
                   + aj * self.joint_w[idx, i1])
        return root_v, root_w, joint_w


def build_db(motions: list) -> MotionDB:
    """Stack Motion clips into a MotionDB, padding time with edge frames."""
    max_T = max(m.num_frames for m in motions)

    def pad(x, T):
        if x.shape[0] == T:
            return np.asarray(x)
        reps = [np.asarray(x)] + [np.asarray(x[-1:])] * (T - x.shape[0])
        return np.concatenate(reps, axis=0)

    fields = ["root_p", "root_q", "joint_q", "root_v", "root_w", "joint_w"]
    stacked = {
        f: jnp.asarray(np.stack([pad(getattr(m, f), max_T) for m in motions]))
        for f in fields
    }
    num_frames = jnp.asarray([m.num_frames for m in motions], dtype=jnp.int32)
    fps = motions[0].fps
    assert all(abs(m.fps - fps) < 1e-6 for m in motions)
    return MotionDB(num_frames=num_frames, fps=float(fps),
                    max_frames=int(max_T), **stacked)
