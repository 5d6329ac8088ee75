"""URDF / char-info / BVH loading against the reference's loco assets."""
import numpy as np
import pytest

from physicsvae_tpu.kinematics import urdf as urdf_mod
from physicsvae_tpu.kinematics.char_info import load_char_info
from physicsvae_tpu.kinematics.bvh import load_bvh
from physicsvae_tpu.kinematics import motion as motion_mod

URDF = "/root/reference/data/character/urdf/loco.urdf"
CHAR_INFO = "/root/reference/data/character/info/loco_char_info.py"
BVH_HIER = "/root/reference/data/motion/loco/loco_hierarchy.bvh"
BVH_CLIP = "/root/reference/data/motion/loco/random_loco_0.bvh"


@pytest.fixture(scope="module")
def model():
    return urdf_mod.load_urdf(URDF)


@pytest.fixture(scope="module")
def char():
    return load_char_info(CHAR_INFO)


def test_urdf_topology(model):
    # 24 joints: 18 spherical + 6 fixed (SURVEY.md §2.1 asset notes)
    assert model.num_joints == 24
    assert int((model.joint_type == urdf_mod.SPHERICAL).sum()) == 18
    assert int((model.joint_type == urdf_mod.FIXED).sum()) == 6
    assert model.link_names[0] == "LHipJoint"
    # topological order
    assert (model.parent < np.arange(24)).all()


def test_urdf_mass(model):
    assert model.base_mass > 0
    assert model.total_mass > 30.0  # a humanoid
    assert (model.mass >= 0).all()


def test_urdf_geoms(model):
    assert model.geom_link.shape[0] > 10
    assert set(np.unique(model.geom_type)).issubset(
        {urdf_mod.GEOM_SPHERE, urdf_mod.GEOM_CAPSULE, urdf_mod.GEOM_BOX})
    # feet have box collision
    lf = model.link_names.index("LeftFoot")
    assert (model.geom_link == lf).any()


def test_char_info(char):
    assert char.num_joints == 24
    assert np.allclose(char.v_up_env, [0, 1, 0])
    assert np.allclose(char.v_face, [0, 0, 1])
    assert char.kp[0] == 500.0
    assert char.kd[0] == 50.0
    assert len(char.end_effectors) == 4
    # joint weights normalized
    total = char.joint_weight.sum() + char.root_joint_weight
    assert np.isclose(total, 1.0, atol=1e-6)
    assert char.collision_ignore_pairs.shape == (15, 2)
    assert char.friction_lateral == 0.8


def test_char_info_matches_urdf(model, char):
    assert char.joint_names == model.link_names
    # movable joints in URDF == dof>0 joints in char info
    assert np.array_equal(model.joint_type != urdf_mod.FIXED, char.dof > 0)


def test_bvh_parse():
    bvh = load_bvh(BVH_CLIP)
    assert bvh.num_frames == 1801
    assert abs(bvh.fps - 30.0) < 0.1
    assert bvh.skel.joint_names[0] == "Hips"
    # quats are unit
    n = np.linalg.norm(bvh.joint_quat, axis=-1)
    assert np.allclose(n, 1.0, atol=1e-5)


def test_motion_retarget(char):
    m = motion_mod.from_bvh_file(BVH_HIER, char)
    assert m.joint_q.shape == (60, 24, 4)
    assert abs(m.length - 59 / 30.0) < 1e-4
    # interpolation endpoints
    p0, q0, jq0 = motion_mod.pose_at_time(m, 0.0)
    assert np.allclose(p0, m.root_p[0], atol=1e-5)
    pe, qe, jqe = motion_mod.pose_at_time(m, m.length)
    assert np.allclose(pe, m.root_p[-1], atol=1e-4)
    # mid-frame interpolation is between neighbors
    pm, _, _ = motion_mod.pose_at_time(m, 0.5 / 30.0)
    assert np.allclose(pm, 0.5 * (m.root_p[0] + m.root_p[1]), atol=1e-5)


def test_motion_db(char):
    m1 = motion_mod.from_bvh_file(BVH_HIER, char)
    db = motion_mod.build_db([m1, m1])
    assert db.num_clips == 2
    p, q, jq = db.pose_at(0, 1.0)
    p1, q1, jq1 = motion_mod.pose_at_time(m1, 1.0)
    assert np.allclose(p, p1, atol=1e-6)
    assert np.allclose(np.abs(np.sum(np.asarray(q) * np.asarray(q1), -1)), 1.0, atol=1e-5)
    assert np.allclose(db.lengths(), [m1.length, m1.length])


def test_native_parser_matches_python():
    from physicsvae_tpu.kinematics import native
    if not native.available():
        import pytest
        pytest.skip("native library not built")
    m1 = native.load_bvh_native(BVH_HIER)
    m2 = load_bvh(BVH_HIER, use_native=False)
    assert m1.skel.joint_names == m2.skel.joint_names
    assert np.allclose(m1.skel.offsets, m2.skel.offsets, atol=1e-5)
    assert np.allclose(m1.root_pos, m2.root_pos, atol=1e-4)
    dot = np.abs(np.sum(m1.joint_quat * m2.joint_quat, -1))
    assert np.allclose(dot, 1.0, atol=1e-5)


def test_collect_motion_files_modes(tmp_path):
    """motion_utils.collect_motion_files parity (motion_utils.py:67-125):
    file/dir lists, num_sample top/random, cluster label files."""
    from physicsvae_tpu.env.config import collect_motion_files

    d = tmp_path / "clips"
    d.mkdir()
    for n in ["b.bvh", "a.bvh", "c.bvh"]:
        (d / n).write_text("HIERARCHY\n")

    # dir listing is sorted
    out = collect_motion_files(str(tmp_path), [{"data": {"dir": ["clips"]}}])
    assert [f.split("/")[-1] for f in out[0]] == ["a.bvh", "b.bvh", "c.bvh"]

    # num_sample top
    out = collect_motion_files(str(tmp_path), [
        {"data": {"dir": ["clips"]}, "num_sample": 2,
         "sample_method": "top"}])
    assert [f.split("/")[-1] for f in out[0]] == ["a.bvh", "b.bvh"]

    # num_sample random: right count, all from the pool
    out = collect_motion_files(str(tmp_path), [
        {"data": {"dir": ["clips"]}, "num_sample": 5,
         "sample_method": "random"}])
    assert len(out[0]) == 5
    assert all(f.split("/")[-1] in {"a.bvh", "b.bvh", "c.bvh"}
               for f in out[0])

    # cluster_info label file: "id rank score filename"
    label = tmp_path / "labels.txt"
    label.write_text("0 0 0.9 a.bvh\n0 1 0.8 b.bvh\n1 0 0.7 c.bvh\n")
    out = collect_motion_files(str(tmp_path), [
        {"cluster_info": {"dir": "clips", "label_file": "labels.txt"}}])
    assert [f.split("/")[-1] for f in out[0]] == ["a.bvh", "b.bvh", "c.bvh"]
    # sample_id restricts to one cluster
    out = collect_motion_files(str(tmp_path), [
        {"cluster_info": {"dir": "clips", "label_file": "labels.txt",
                          "sample_id": 1}}])
    assert [f.split("/")[-1] for f in out[0]] == ["c.bvh"]
