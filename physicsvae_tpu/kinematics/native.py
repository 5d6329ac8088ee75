"""ctypes bindings to the native host library (native/libpvae_host.so).

Falls back silently to the pure-Python path when the library has not been
built (`make -C native`).  The native BVH parser loads the 1801-frame loco
clips ~20x faster than the tokenizing Python parser — useful when motion DBs
grow to thousands of clips.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from .bvh import BvhMotion, BvhSkeleton, _euler_seq_to_quat

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CHANNEL_NAMES = ["Xposition", "Yposition", "Zposition",
                  "Xrotation", "Yrotation", "Zrotation"]


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libpvae_host.so"),
        os.path.join(os.path.dirname(__file__), "libpvae_host.so"),
    ]
    for c in candidates:
        if os.path.exists(c):
            lib = ctypes.CDLL(c)
            lib.bvh_parse.restype = ctypes.c_void_p
            lib.bvh_parse.argtypes = [ctypes.c_char_p]
            lib.bvh_num_joints.argtypes = [ctypes.c_void_p]
            lib.bvh_num_frames.argtypes = [ctypes.c_void_p]
            lib.bvh_frame_time.restype = ctypes.c_double
            lib.bvh_frame_time.argtypes = [ctypes.c_void_p]
            lib.bvh_total_channels.argtypes = [ctypes.c_void_p]
            lib.bvh_joint_name.restype = ctypes.c_char_p
            lib.bvh_joint_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.bvh_parent.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.bvh_offsets.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_float)]
            lib.bvh_num_channels.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.bvh_channels.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                         ctypes.POINTER(ctypes.c_int)]
            lib.bvh_data.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float)]
            lib.bvh_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def load_bvh_native(path: str, scale: float = 1.0) -> BvhMotion:
    """Native-parser equivalent of kinematics.bvh.load_bvh."""
    lib = _find_lib()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    h = lib.bvh_parse(path.encode())
    if not h:
        raise IOError(f"failed to parse {path}")
    try:
        N = lib.bvh_num_joints(h)
        T = lib.bvh_num_frames(h)
        frame_time = lib.bvh_frame_time(h)
        total = lib.bvh_total_channels(h)

        names = [lib.bvh_joint_name(h, j).decode() for j in range(N)]
        parents = np.asarray([lib.bvh_parent(h, j) for j in range(N)],
                             dtype=np.int32)
        offsets = np.zeros((N, 3), dtype=np.float32)
        lib.bvh_offsets(h, offsets.ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)))
        channels = []
        for j in range(N):
            nc = lib.bvh_num_channels(h, j)
            buf = (ctypes.c_int * nc)()
            lib.bvh_channels(h, j, buf)
            channels.append([_CHANNEL_NAMES[c] for c in buf])
        data = np.zeros((T, total), dtype=np.float32)
        lib.bvh_data(h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    finally:
        lib.bvh_free(h)

    root_pos = np.zeros((T, 3))
    joint_quat = np.zeros((T, N, 4))
    joint_quat[..., 3] = 1.0
    c = 0
    rot_map = {"Xrotation": 0, "Yrotation": 1, "Zrotation": 2}
    pos_map = {"Xposition": 0, "Yposition": 1, "Zposition": 2}
    for j in range(N):
        chs = channels[j]
        rot_order, rot_cols = [], []
        for k, ch in enumerate(chs):
            if ch in rot_map:
                rot_order.append(rot_map[ch])
                rot_cols.append(c + k)
            elif ch in pos_map and j == 0:
                root_pos[:, pos_map[ch]] = data[:, c + k]
        if rot_cols:
            joint_quat[:, j] = _euler_seq_to_quat(
                data[:, rot_cols].astype(np.float64), rot_order)
        c += len(chs)

    root_pos = (root_pos + offsets[0]) * scale
    skel = BvhSkeleton(joint_names=names, parents=parents,
                       offsets=offsets * scale, channels=channels)
    return BvhMotion(skel=skel, root_pos=root_pos, joint_quat=joint_quat,
                     fps=1.0 / frame_time)
