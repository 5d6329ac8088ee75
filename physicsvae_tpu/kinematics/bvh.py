"""Host-side BVH parser.

Replaces the fairmotion bvh loader used by the reference (e.g.
envs/env_humanoid_base.py:182-191, motion_utils.py:33-48).  Parses hierarchy
and channel data with numpy; rotation channels are converted to xyzw
quaternions per joint.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BvhSkeleton:
    joint_names: list         # length N (depth-first order)
    parents: np.ndarray       # (N,) parent joint index, -1 for root
    offsets: np.ndarray       # (N,3)
    channels: list            # per joint: list of channel names


@dataclasses.dataclass
class BvhMotion:
    skel: BvhSkeleton
    root_pos: np.ndarray      # (T,3) root translation (offset applied)
    joint_quat: np.ndarray    # (T,N,4) local rotations (xyzw)
    fps: float

    @property
    def num_frames(self):
        return self.root_pos.shape[0]


_ROT = {"Xrotation": 0, "Yrotation": 1, "Zrotation": 2}
_POS = {"Xposition": 0, "Yposition": 1, "Zposition": 2}


def _euler_seq_to_quat(angles_deg: np.ndarray, order: list) -> np.ndarray:
    """Compose rotation channels in file order: R = R_c0 @ R_c1 @ R_c2.

    angles_deg: (T, len(order)).  Returns (T,4) xyzw quats.
    """
    T = angles_deg.shape[0]
    q = np.zeros((T, 4))
    q[:, 3] = 1.0
    for k, axis in enumerate(order):
        half = np.deg2rad(angles_deg[:, k]) * 0.5
        c, s = np.cos(half), np.sin(half)
        qa = np.zeros((T, 4))
        qa[:, axis] = s
        qa[:, 3] = c
        # q = q * qa (Hamilton, xyzw)
        x1, y1, z1, w1 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        x2, y2, z2, w2 = qa[:, 0], qa[:, 1], qa[:, 2], qa[:, 3]
        q = np.stack(
            [
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            ],
            axis=-1,
        )
    return q


def load_bvh(path: str, scale: float = 1.0,
             use_native: bool = True) -> BvhMotion:
    """Parse a BVH file.  Uses the native C++ parser
    (native/libpvae_host.so, see kinematics/native.py) when built; falls back
    to the pure-Python tokenizer."""
    if use_native:
        try:
            from .native import available, load_bvh_native
            if available():
                return load_bvh_native(path, scale=scale)
        except Exception:
            pass
    with open(path) as f:
        tokens = f.read().split()

    i = 0

    def tok():
        nonlocal i
        t = tokens[i]
        i += 1
        return t

    assert tok() == "HIERARCHY"
    names, parents, offsets, channels = [], [], [], []
    stack = []

    while True:
        t = tok()
        if t in ("ROOT", "JOINT"):
            name = tok()
            parent = stack[-1] if stack else -1
            idx = len(names)
            names.append(name)
            parents.append(parent)
            offsets.append(np.zeros(3))
            channels.append([])
            assert tok() == "{"
            stack.append(idx)
        elif t == "OFFSET":
            off = np.array([float(tok()), float(tok()), float(tok())])
            if stack:
                offsets[stack[-1]] = off
        elif t == "CHANNELS":
            n = int(tok())
            channels[stack[-1]] = [tok() for _ in range(n)]
        elif t == "End":
            assert tok() == "Site"
            assert tok() == "{"
            assert tok() == "OFFSET"
            tok(); tok(); tok()
            assert tok() == "}"
        elif t == "}":
            stack.pop()
        elif t == "MOTION":
            break
        else:
            raise ValueError(f"Unexpected BVH token: {t}")

    assert tok() == "Frames:"
    num_frames = int(tok())
    assert tok() == "Frame" and tok() == "Time:"
    frame_time = float(tok())

    data = np.array(tokens[i:], dtype=np.float64)
    total_channels = sum(len(c) for c in channels)
    data = data[: num_frames * total_channels].reshape(num_frames, total_channels)

    N = len(names)
    root_pos = np.zeros((num_frames, 3))
    joint_quat = np.zeros((num_frames, N, 4))
    joint_quat[..., 3] = 1.0

    c = 0
    for j in range(N):
        chs = channels[j]
        rot_order, rot_cols, pos_cols = [], [], {}
        for k, ch in enumerate(chs):
            if ch in _ROT:
                rot_order.append(_ROT[ch])
                rot_cols.append(c + k)
            elif ch in _POS:
                pos_cols[_POS[ch]] = c + k
        if pos_cols and j == 0:
            for ax, col in pos_cols.items():
                root_pos[:, ax] = data[:, col]
        if rot_cols:
            joint_quat[:, j] = _euler_seq_to_quat(data[:, rot_cols], rot_order)
        c += len(chs)

    root_pos = (root_pos + offsets[0]) * scale

    skel = BvhSkeleton(
        joint_names=names,
        parents=np.array(parents, dtype=np.int32),
        offsets=np.stack(offsets) * scale,
        channels=channels,
    )
    return BvhMotion(
        skel=skel,
        root_pos=root_pos,
        joint_quat=joint_quat,
        fps=1.0 / frame_time,
    )
