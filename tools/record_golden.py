#!/usr/bin/env python
"""Record PyBullet golden trajectories for cross-engine parity tests.

RUN THIS ON A MACHINE WITH `pybullet` INSTALLED (it is not available in the
TPU image — PARITY.md "Why there are no PyBullet golden trajectories").
Copy the resulting `tests/goldens/*.npz` into the repo; the comparison
tests in `tests/test_goldens.py` activate automatically when they exist.

The sim setup mirrors the reference exactly:
  - 480 Hz, 10 solver iterations, cone friction
    (envs/env_humanoid_tracking.py:241-250)
  - loco.urdf with self-collision flags + char-info collision-ignore pairs
    (sim_agent.py:67-86)
  - STABLE_PD_CONTROL with char-info gains kp=500/kd=50, max forces
    (sim_agent.py:694-703, loco_char_info.py:242-314)

Scenarios (per-control-step root_p/root_q xyzw/joint_q/joint_w at 30 Hz):
  drop_spd_hold : T-pose dropped from 1.2 m, SPD holding the T-pose
  free_fall     : gravity only, motors off, 0.5 s from 3 m
  spd_track     : SPD tracking frame 0 of a reference clip for 2 s

Usage:
  python tools/record_golden.py --urdf data/character/urdf/loco.urdf \
      --char_info data/character/info/loco_char_info.py \
      --out tests/goldens/
"""
import argparse
import importlib.util
import os

import numpy as np


def load_char_info(path):
    spec = importlib.util.spec_from_file_location("char_info", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_world(pb, urdf, ci):
    pb.resetSimulation()
    pb.setGravity(0, -9.8, 0)
    # reference solver params (envs/env_humanoid_tracking.py:241-250)
    pb.setPhysicsEngineParameter(
        fixedTimeStep=1.0 / 480.0,
        numSolverIterations=10,
        enableConeFriction=True,
    )
    plane = pb.createCollisionShape(
        pb.GEOM_PLANE, planeNormal=[0, 1, 0])
    ground = pb.createMultiBody(0, plane)
    pb.changeDynamics(ground, -1, lateralFriction=1.0, restitution=0.0)
    body = pb.loadURDF(
        urdf, [0, 1.0, 0], useFixedBase=False,
        flags=pb.URDF_USE_SELF_COLLISION
        | pb.URDF_USE_SELF_COLLISION_EXCLUDE_ALL_PARENTS)
    # collision-ignore pairs (sim_agent.py:80-86)
    for i, j in getattr(ci, "collison_ignore_pairs", []):
        pb.setCollisionFilterPair(body, body, i, j, enableCollision=False)
    nj = pb.getNumJoints(body)
    for j in range(nj):
        pb.changeDynamics(body, j,
                          lateralFriction=getattr(ci, "friction_lateral", 0.8),
                          restitution=getattr(ci, "restitution", 0.0),
                          jointDamping=0.02)
        # release default velocity motors
        pb.setJointMotorControlMultiDof(
            body, j, pb.POSITION_CONTROL, targetPosition=[0, 0, 0, 1],
            positionGain=0, velocityGain=0, force=[0, 0, 0])
    pb.changeDynamics(body, -1,
                      lateralFriction=getattr(ci, "friction_lateral", 0.8),
                      restitution=getattr(ci, "restitution", 0.0))
    return body


def spherical_joints(pb, body):
    out = []
    for j in range(pb.getNumJoints(body)):
        if pb.getJointInfo(body, j)[2] == pb.JOINT_SPHERICAL:
            out.append(j)
    return out


def set_pose(pb, body, root_p, root_q, joint_q, sph):
    pb.resetBasePositionAndOrientation(body, root_p, root_q)
    pb.resetBaseVelocity(body, [0, 0, 0], [0, 0, 0])
    for idx, j in enumerate(sph):
        pb.resetJointStateMultiDof(body, j, joint_q[idx], [0, 0, 0])


def spd_targets(pb, body, ci, sph, target_q):
    kps, kds, forces = [], [], []
    for idx, j in enumerate(sph):
        # char-info tables are keyed by reference joint index == link index
        kp = ci.kp.get(idx, 500.0) if isinstance(ci.kp, dict) else 500.0
        kd = ci.kd.get(idx, 50.0) if isinstance(ci.kd, dict) else 50.0
        mf = ci.max_force.get(idx, 1000.0) \
            if isinstance(ci.max_force, dict) else 1000.0
        kps.append(kp)
        kds.append(kd)
        forces.append([mf] * 3)
    pb.setJointMotorControlMultiDofArray(
        body, sph, pb.STABLE_PD_CONTROL,
        targetPositions=list(target_q),
        positionGains=kps, velocityGains=kds, forces=forces)


def record(pb, body, sph, steps_con, substeps=16, actuate=None):
    T = steps_con
    nj = len(sph)
    root_p = np.zeros((T, 3))
    root_q = np.zeros((T, 4))
    joint_q = np.zeros((T, nj, 4))
    joint_w = np.zeros((T, nj, 3))
    for t in range(T):
        for _ in range(substeps):
            if actuate is not None:
                actuate()
            pb.stepSimulation()
        p, q = pb.getBasePositionAndOrientation(body)
        root_p[t] = p
        root_q[t] = q
        for idx, j in enumerate(sph):
            js = pb.getJointStateMultiDof(body, j)
            joint_q[t, idx] = js[0]
            joint_w[t, idx] = js[1]
    return dict(root_p=root_p, root_q=root_q, joint_q=joint_q,
                joint_w=joint_w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--urdf", required=True)
    ap.add_argument("--char_info", required=True)
    ap.add_argument("--out", default="tests/goldens")
    ap.add_argument("--bvh", default=None,
                    help="optional reference BVH for the track scenario")
    args = ap.parse_args()

    import pybullet as pb_mod
    import pybullet_utils.bullet_client as bc
    pb = bc.BulletClient(connection_mode=pb_mod.DIRECT)

    ci = load_char_info(args.char_info)
    os.makedirs(args.out, exist_ok=True)

    # --- drop_spd_hold ---------------------------------------------------
    body = build_world(pb, args.urdf, ci)
    sph = spherical_joints(pb, body)
    tpose = [[0.0, 0.0, 0.0, 1.0]] * len(sph)
    set_pose(pb, body, [0, 1.2, 0], [0, 0, 0, 1], tpose, sph)
    traj = record(pb, body, sph, steps_con=60,
                  actuate=lambda: spd_targets(pb, body, ci, sph, tpose))
    np.savez(os.path.join(args.out, "drop_spd_hold.npz"),
             scenario="drop_spd_hold", start_h=1.2, **traj)
    print("wrote drop_spd_hold.npz")

    # --- free_fall -------------------------------------------------------
    body = build_world(pb, args.urdf, ci)
    sph = spherical_joints(pb, body)
    set_pose(pb, body, [0, 3.0, 0], [0, 0, 0, 1], tpose, sph)
    traj = record(pb, body, sph, steps_con=15)   # 0.5 s, no ground contact
    np.savez(os.path.join(args.out, "free_fall.npz"),
             scenario="free_fall", start_h=3.0, **traj)
    print("wrote free_fall.npz")

    # --- spd_track (optional, needs a BVH pose source) -------------------
    if args.bvh:
        try:
            from fairmotion.data import bvh as fm_bvh
            motion = fm_bvh.load(args.bvh)
            pose0 = motion.get_pose_by_time(0.0)
            # project frame-0 local rotations onto the spherical joints in
            # char-info bvh_map order (sim_agent.py:393-447)
            import fairmotion.ops.conversions as conv
            targets = []
            for idx in range(len(sph)):
                name = ci.bvh_map.get(idx)
                if name is None:
                    targets.append([0, 0, 0, 1])
                    continue
                T = pose0.get_transform(name, local=True)
                R, _ = conv.T2Rp(T)
                targets.append(list(conv.R2Q(R)))
            body = build_world(pb, args.urdf, ci)
            sph = spherical_joints(pb, body)
            set_pose(pb, body, [0, 1.0, 0], [0, 0, 0, 1], targets, sph)
            traj = record(
                pb, body, sph, steps_con=60,
                actuate=lambda: spd_targets(pb, body, ci, sph, targets))
            np.savez(os.path.join(args.out, "spd_track.npz"),
                     scenario="spd_track", **traj)
            print("wrote spd_track.npz")
        except ImportError:
            print("fairmotion unavailable; skipping spd_track")


if __name__ == "__main__":
    main()
