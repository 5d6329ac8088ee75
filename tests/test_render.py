"""Headless renderer: ray-traced primitives from simulation state
(TinyRenderer/getCameraImage replacement, env_renderer.py:141-161)."""
import numpy as np
import pytest

from physicsvae_tpu.kinematics.urdf import (GEOM_BOX, GEOM_CAPSULE,
                                            GEOM_SPHERE)
from physicsvae_tpu.runtime.render import (FollowCamera, Scene,
                                           render_frame, write_video)


def _scene_with(types, poss, sizes):
    sc = Scene()
    for t, p, s in zip(types, poss, sizes):
        sc.types.append(t)
        sc.pos.append(np.asarray(p, np.float32))
        sc.quat.append(np.array([0, 0, 0, 1], np.float32))
        sc.size.append(np.asarray(s, np.float32))
        sc.color.append(np.array([0.8, 0.2, 0.2], np.float32))
    return sc.finalize()


def test_sphere_visible_center_screen():
    sc = _scene_with([GEOM_SPHERE], [[0, 1, 0]], [[0.5, 0, 0]])
    img = render_frame(sc, [0, 1, 4], [0, 1, 0], width=96, height=64)
    assert img.shape == (64, 96, 3) and img.dtype == np.uint8
    center = img[32, 48].astype(float)
    corner = img[2, 2].astype(float)
    # red-ish sphere at center, sky at the corner
    assert center[0] > center[2]
    assert corner[2] > corner[0]


def test_all_primitives_and_ground_shadow():
    sc = _scene_with(
        [GEOM_SPHERE, GEOM_CAPSULE, GEOM_BOX],
        [[-1, 1, 0], [0, 1, 0], [1, 1, 0]],
        [[0.3, 0, 0], [0.2, 0.3, 0], [0.25, 0.25, 0.25]])
    img = render_frame(sc, [0, 2, 5], [0, 0.8, 0], width=128, height=96)
    # ground occupies the bottom rows; sky the top; primitives in between
    assert img[95, 64].std() < 60  # greyish ground
    reds = (img[:, :, 0].astype(int) - img[:, :, 2].astype(int)) > 20
    assert reds.sum() > 20  # the red primitives are visible


def test_follow_camera_smooths():
    cam = FollowCamera(smooth=0.5)
    eye0, tgt0 = cam.update([0.0, 1.0, 0.0])
    eye1, tgt1 = cam.update([2.0, 1.0, 0.0])
    assert 0.5 < tgt1[0] < 2.0  # lags the target


def test_write_video_gif(tmp_path):
    frames = [np.full((32, 48, 3), v, np.uint8) for v in (0, 128, 255)]
    out = write_video(str(tmp_path / "x.gif"), frames, fps=10)
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_write_video_mp4(tmp_path):
    frames = [np.full((32, 48, 3), v, np.uint8) for v in (0, 128, 255)]
    out = write_video(str(tmp_path / "x.mp4"), frames, fps=10)
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_render_character_from_urdf():
    """Full loco character at T-pose renders without error and covers a
    reasonable pixel area."""
    from physicsvae_tpu.kinematics.urdf import load_urdf
    cm = load_urdf("/root/reference/data/character/urdf/loco.urdf")
    NB = cm.num_joints + 1
    # crude FK-free pose: all links at the origin area (render only cares
    # that world poses are sane, so stack them vertically)
    body_q = np.tile(np.array([0, 0, 0, 1], np.float32), (NB, 1))
    body_p = np.zeros((NB, 3), np.float32)
    body_p[:, 1] = 1.0
    sc = Scene()
    sc.add_character(cm, body_q, body_p, np.array([0.3, 0.5, 0.8]))
    sc.finalize()
    assert sc.types.shape[0] == cm.geom_link.shape[0]
    img = render_frame(sc, [0, 1.5, 3.5], [0, 1, 0], width=96, height=64)
    # character pixels: blue-dominant region exists
    blues = (img[:, :, 2].astype(int) - img[:, :, 0].astype(int)) > 15
    assert blues.sum() > 10


def test_render_flags_registry():
    """Toggle registry parity with render_module.py:17-76."""
    from physicsvae_tpu.runtime.render_flags import (RenderFlags,
                                                     TOGGLE_KEYS,
                                                     COLORS_FOR_AGENTS)
    f = RenderFlags()
    # reference defaults
    assert f.get("ground") is True and f.get("origin") is False
    assert f.get("follow_cam") == "fixed"
    # bool toggle by key ('1' -> ground) and by name
    name, val = f.toggle("1")
    assert (name, val) == ("ground", False)
    assert f.toggle("ground") == ("ground", True)
    # multi-state cycling ('0' -> follow_cam fixed -> pos -> pos+rot -> fixed)
    assert f.toggle("0") == ("follow_cam", "pos")
    assert f.toggle("0") == ("follow_cam", "pos+rot")
    assert f.toggle("0") == ("follow_cam", "fixed")
    # every reference key binding resolves
    for k, nm in TOGGLE_KEYS.items():
        assert nm in f.flag
    assert COLORS_FOR_AGENTS.shape == (17, 3)
    import pytest as _pytest
    with _pytest.raises(KeyError):
        f.toggle("zzz")


def test_render_flags_honored():
    """ground/shadow/fog/sim_model flags change the rendered image."""
    from physicsvae_tpu.runtime.render_flags import RenderFlags
    sc = _scene_with([GEOM_SPHERE], [[0, 1, 0]], [[0.5, 0, 0]])
    on = render_frame(sc, [0, 1.5, 4], [0, 0.8, 0], width=64, height=48)
    off = render_frame(sc, [0, 1.5, 4], [0, 0.8, 0], width=64, height=48,
                       draw_ground=False)
    # without ground the bottom rows become sky (blue-dominant)
    assert (off[47, 32, 2].astype(int) - off[47, 32, 0].astype(int)) > 10
    assert not np.array_equal(on, off)


def test_follow_camera_modes():
    from physicsvae_tpu.runtime.render import FollowCamera
    fixed = FollowCamera(mode="fixed", smooth=1.0)
    e0, t0 = fixed.update([0.0, 1.0, 0.0])
    e1, t1 = fixed.update([5.0, 1.0, 0.0])
    assert np.allclose(t0, t1)  # pinned
    rot = FollowCamera(mode="pos+rot", smooth=1.0)
    q_id = np.array([0, 0, 0, 1.0])
    # yaw 90 deg about +y (up): q = (0, sin45, 0, cos45)
    q_90 = np.array([0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)])
    eA, _ = rot.update([0.0, 1.0, 0.0], root_q=q_id)
    rot2 = FollowCamera(mode="pos+rot", smooth=1.0)
    eB, _ = rot2.update([0.0, 1.0, 0.0], root_q=q_90)
    assert not np.allclose(eA, eB)  # offset follows heading
    assert np.isclose(np.linalg.norm(eA), np.linalg.norm(eB), atol=1e-4)
