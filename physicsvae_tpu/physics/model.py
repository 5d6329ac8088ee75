"""PhysicsModel: the static, device-resident description the batched physics
core consumes.

Replaces Bullet's internal multibody data structures (reference:
sim_agent.py:101-193 precomputes the same joint/gain/mass tables from the
loaded URDF).  Everything here is computed once on the host; the arrays are
then closed over by jitted step functions.

Generalized coordinates:
  q = (root_p (3), root_q (4, xyzw), joint_q (J,4))
  v = [root linear velocity (world, 3) | root angular velocity (world, 3) |
       per-movable-joint angular velocity (child frame, 3 each)]  -> (NV,)

Body indexing: body 0 = floating base, body k = URDF link k-1 (Bullet link
ordering, sim_agent.py:92-95).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..kinematics.char_info import CharInfo
from ..kinematics.urdf import (CharacterModel, FIXED, GEOM_BOX, GEOM_CAPSULE,
                               GEOM_SPHERE, REVOLUTE, SPHERICAL)


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Simulation parameters (reference envs/env_humanoid_tracking.py:123-132,
    241-250)."""

    fps_sim: int = 480
    fps_con: int = 30
    solver_iters: int = 10       # PGS iterations (numSolverIterations)
    num_contacts: int = 16       # top-K contact buffer size per character
    mu: float = 0.8              # lateral friction (char 0.8 * plane 1.0)
    restitution: float = 0.0
    baumgarte: float = 0.2       # position-error velocity feedback
    contact_slop: float = 0.002
    gravity: float = -9.8
    joint_damping: float = 0.02  # URDF <dynamics damping>
    # Actuation mode (SimAgent.Actuation, sim_agent.py:29-46):
    # spd | pd | cpd | cp | v | tq | none
    actuation: str = "spd"
    self_collision: bool = True  # physics_param self_collision (spec)
    num_self_contacts: int = 8   # top-K2 self-contact buffer
    # APGD iterations (Bullet runs 10 GS).  With the per-contact Jacobi
    # preconditioner 10 cold / 5 warm iterations hold the Coulomb fidelity
    # fixtures (static slip / kinetic error thresholds unchanged from the
    # 16/8 unpreconditioned setting).
    apgd_iters: int = 10
    # iterations when warm-started from the previous substep's impulses
    # (Bullet warm-starts its sequential impulses the same way)
    apgd_warm_iters: int = 5
    ns_iters: int = 1            # Newton–Schulz refinements per warm substep
    # Refinement cadence across the warm substeps of one control step:
    # 1 = refine every substep (reference-faithful tracking of M_hat);
    # 0 = hold the inverse fixed after the first substep's refinement —
    # the pose drifts at most 1/fps_con before the next refinement, and
    # M_hat, the mass-matrix build, and the NS matmuls all become dead
    # code in the 15 warm substeps (XLA DCE).  Default 0: the on-chip A/B
    # measured 45,962 -> 70,747 env steps/s (+54%) at B=2048, the
    # closed-form fidelity laws pass with the held inverse
    # (PVAE_TEST_HOLD_MINV=1), and a contact-rich 30-control-step rollout
    # diverges from the per-substep-refined path at 0.65x the intrinsic
    # chaos rate (tools/compare_hold_minv.py).
    ns_refine_every: int = 0
    # Per-control-step cold inverse: "ns" = factorization-free Newton–
    # Schulz from the Pan–Schreiber seed (pure MXU matmuls, ~3x faster
    # than the TPU Cholesky custom-call at B=2048); "chol" = exact
    # Cholesky (reference-style; used by fidelity cross-checks).
    cold_inverse: str = "ns"
    ns_cold_iters: int = 22
    # Carry the refined inverse across control steps (ImitationEnv seeds
    # resets from a per-frame motion-DB table; see control_step_carry).
    carry_minv: bool = True
    # f32 Newton–Schulz refinements applied to the carried/table seed on
    # the first substep of each control step (control_step_carry).  The
    # r5 trace puts these matmuls at ~13% of device time; same-episode
    # seeds are only 1/fps_con stale and converge in fewer iterations
    # than the worst-case table seed.  Default 2 since r5 (+6.4%,
    # 117.1k -> 124.1k env steps/s at B=2048): on the physical tracking
    # ensemble (clip states + clip-tracking SPD targets, the hot path's
    # real distribution) two-control-step error vs a converged reference
    # is ratio 0.94 median / 0.97 p95 vs the cold baseline with zero
    # divergences (tools/fidelity_local.py --carry --physical,
    # data/learning/fidelity_r5_carry_tracking.json).
    seed_refine_iters: int = 2
    use_pallas_fk: bool = False  # route batched FK through the Pallas kernel
    # VMEM-resident Pallas APGD: A read once per substep instead of every
    # iteration (ops/apgd_kernel.py).  In-context A/B at B=2048: +11%
    # alone, +22% with the fused dynamics kernel (docs/PERF_r3.md); the
    # r2 f32 variant lost, this one is bf16 + no extra materialization.
    # Takes effect only when the default backend is TPU (CPU runs and the
    # virtual-mesh dryrun keep the XLA path — no CPU lowering).
    use_pallas_apgd: bool = True
    # Fused kinematics+dynamics-terms Pallas kernel (ops/dyn_kernel.py):
    # FK + spatial inertia + motion subspace + spatial velocity + RNEA
    # bias + contact points in ONE batch-on-lanes program.  In-context
    # A/B: +10% alone, +22% with the VMEM APGD kernel; trajectory
    # divergence vs the XLA path matches the intrinsic chaos rate
    # (tools/compare_step_kernels.py GATE ratio 0.98).  TPU-only, as
    # above.
    use_fused_dynamics: bool = True
    # Lean warm-substep variant of the fused dynamics kernel: held-inverse
    # warm substeps never read the mass matrix, so the kernel skips the
    # S / I_sp / V / com / body-velocity writes (~80% of its output rows)
    # and, for stable-PD, computes the SPD torque in-kernel (the c output
    # becomes tau - damping*vel - c).  False = always run the full kernel
    # (the ablation control for the r3b A/B).
    fuse_warm_kernel: bool = True
    # Self-collision narrow phase inside the fused dynamics kernel: the
    # 263-pair capsule-capsule chain runs on VMEM-resident (P, Bt) tiles
    # instead of materializing ~150 MB/substep of (B,P,3) intermediates
    # in HBM (r4 trace: ~23% of device time).  Selection (top-K2) stays
    # in XLA.  False = XLA narrow phase (the ablation control).
    fuse_self_narrow: bool = True
    # Feature-major contact selection fused into the dynamics-kernel
    # dispatch (step._fused_dynamics_sel): ground detection, top-K
    # ranking, and the one-hot gathers run on the kernel's native
    # (rows, batch-lanes) layout and only the K selected rows are
    # transposed to batch-major.  Removes the (B,P,·) candidate-feature
    # relayouts (30 MB/substep at B=2048) and the MXU-padded tiny one-hot
    # einsums of the batch-major path.  Identical ranking formula —
    # selections are bit-identical.  Applies on the fused TPU path
    # without dynamic obstacles, when the ground is a trace-time constant
    # (scalar plane or Heightmap).  False = batch-major selection (the
    # ablation control).
    fuse_selection: bool = True
    # Hold the CONTACT OPERATOR (top-K selection, Jacobian, Delassus
    # J M^-1 J^T, cone bases) across the warm substeps of a control step,
    # the same cadence trick as the held inverse: the contact set barely
    # changes within 1/fps_con, warm substeps refresh only penetration
    # depths (one-hot gathers over the fresh candidate positions the fused
    # kernel already outputs) and the APGD solve.  Kills the per-substep
    # Delassus build — the single most bandwidth-hungry op in the r4
    # device trace — plus the top-K ranking and Jacobian build.  Applies
    # only under the held-inverse preconditions (spd + ns_refine_every=0)
    # and without dynamic obstacles (step._hold_contacts_ok).
    hold_contacts: bool = False
    # Matrix-free warm contact solve (ops/apgd_mf_kernel.py): every warm
    # substep still re-detects, re-selects, and re-solves against FRESH
    # J and M^-1 — but A = J M^-1 J^T is applied matrix-free in VMEM, so
    # the Delassus/W matmuls (21.8 GB of the 85 GB a 5-step r4 trace
    # touches) never round-trip HBM.  Only the APGD step sizes (a
    # preconditioner — cannot move the fixed point) are carried from the
    # control step's rebuild substep.  Applies under the held-inverse
    # preconditions without dynamic obstacles (step._mf_ok).
    use_mf_apgd: bool = False
    # Held contact SELECTION + matrix-free warm solve: hold only the
    # top-K selection INDICES (which candidate point / self pair occupies
    # which contact slot) for hold_selection_every substeps, while every
    # physical quantity — positions, depths, normals, Jacobian, M^-1
    # action — is rebuilt fresh from the current state each substep.
    # Pinning slot identity is what the two r4-rejected cadences lacked:
    # it keeps the carried per-slot Gershgorin step sizes of the
    # matrix-free APGD kernel valid (the pure-MF path failed its chaos
    # gate 8.84x because top-K reordering misassigned them,
    # docs/PERF_r4.md) and deletes the per-substep ranking, while fresh
    # geometry avoids the held-operator divergence (8.5-11.5x).  The only
    # approximation left: a NEW deepest contact can be missed for at most
    # hold_selection_every-1 substeps (<= 6 ms).  Applies under the
    # held-inverse preconditions without dynamic obstacles
    # (step._hsel_ok); takes precedence over hold_contacts/use_mf_apgd.
    # Default-on since r5: +23% full env step (94.5k -> 116.7k at
    # B=2048); local truncation gate at cadence 8: median ratio
    # 1.04-1.05, p95 0.96-0.98, 0 extra divergences over two 256-state
    # scramble ensembles (docs/PERF_r5.md).
    hold_selection: bool = True
    # Selection rebuild cadence in substeps; must divide num_substeps.
    # 8 = two selection refreshes per control step; a NEW deepest
    # contact is missed for at most 7 substeps (~15 ms).
    hold_selection_every: int = 8
    # Operator rebuild cadence in substeps: a full hold across all 16
    # substeps (cadence 16) exceeds the intrinsic chaos rate on the
    # contact-rich gate (tools/compare_hold_contacts.py: 11.8x), so the
    # operator is re-assembled every k-th substep and held between.  Must
    # divide num_substeps.
    hold_contacts_every: int = 4
    # bf16 inputs (f32 accumulation) for the bandwidth-dominant matmuls:
    # Newton–Schulz refinement, Delassus build, APGD matvec, qdd solve.
    # Validated: humanoid standing trajectory within 0.4 mm of f32 over 1 s;
    # Coulomb/pendulum fidelity errors 0.1%/0.01% (tests/test_fidelity.py
    # runs both modes' laws).  Opt out per-spec via physics.matmul_bf16.
    matmul_bf16: bool = True

    @property
    def dt_sim(self) -> float:
        return 1.0 / self.fps_sim

    @property
    def dt_con(self) -> float:
        return 1.0 / self.fps_con

    @property
    def num_substeps(self) -> int:
        assert self.fps_sim % self.fps_con == 0
        return self.fps_sim // self.fps_con


@dataclasses.dataclass(frozen=True)
class PhysicsModel:
    """Static arrays (numpy on host; jnp views created lazily by users)."""

    params: SimParams

    num_joints: int              # J
    num_bodies: int              # NB = J + 1
    nv: int                      # generalized velocity dim

    # Topology
    body_parent: np.ndarray      # (NB,) parent body, -1 for base
    joint_type: np.ndarray       # (J,)
    joint_pos: np.ndarray        # (J,3) in parent LINK frame
    joint_quat: np.ndarray       # (J,4)
    movable: np.ndarray          # (J,) bool
    joint_dof_start: np.ndarray  # (J,) index into v, -1 if fixed

    # Mass properties (body-indexed, 0 = base)
    mass: np.ndarray             # (NB,)
    com: np.ndarray              # (NB,3) local
    inertia: np.ndarray          # (NB,3,3) local, about COM

    # Dof tables
    dof_body: np.ndarray         # (NV,) body the dof's joint connects (child)
    dof_joint: np.ndarray        # (NV,) joint index, -1 for root dofs
    dof_axis_local: np.ndarray   # (NV,3) axis in the child joint frame
    #                              (root dofs: world axes; spherical: e_k;
    #                               revolute: the URDF joint axis)
    dof_is_ang: np.ndarray       # (NV,) bool
    anc: np.ndarray              # (NB, NV) bool ancestor-dof mask
    anc_pair: np.ndarray         # (NV, NV) bool: e ancestor-or-self of d
    joint_ndof: np.ndarray       # (J,) dofs per joint (0 fixed / 1 rev / 3)
    mov_joints: np.ndarray       # (n_mov,) movable joint indices
    mov_dof_T: np.ndarray        # (n_mov, NV-6, 3) joint<->dof projection

    # Actuation (dof-indexed; zeros on root dofs)
    kp: np.ndarray               # (NV,) stable-PD gains
    kd: np.ndarray               # (NV,)
    kp_pd: np.ndarray            # (NV,) explicit-PD gains
    kd_pd: np.ndarray            # (NV,)
    cpd_ratio: float             # constraint-motor gain scale (char info)
    max_force: np.ndarray        # (NV,)
    damping: np.ndarray          # (NV,)

    # Contact candidate points
    point_body: np.ndarray       # (NP,)
    point_pos: np.ndarray        # (NP,3) local (link frame)
    point_radius: np.ndarray     # (NP,)
    point_allow: np.ndarray      # (NP,) bool: ground contact allowed

    # Self-collision capsule approximations + candidate pair list
    cap_a: np.ndarray            # (NB,3) capsule endpoint (link frame)
    cap_b: np.ndarray            # (NB,3)
    cap_r: np.ndarray            # (NB,)
    self_pairs: np.ndarray       # (P2,2) body index pairs

    # Joints grouped by tree depth (tuple of int arrays): joints within a
    # level have independent parents, so FK/RNEA recursions process a whole
    # level in one batched op instead of one op per joint (8 levels vs 24
    # sequential joints for the loco character).
    levels: tuple

    # Per-link metadata mirrored from char info
    link_contact_allow: np.ndarray  # (NB,) bool
    joint_weight: np.ndarray        # (NB,) normalized weights (0 = base)
    end_effectors: np.ndarray       # body indices
    v_up: np.ndarray
    v_face: np.ndarray
    v_up_env: np.ndarray

    @property
    def total_mass(self) -> float:
        return float(self.mass.sum())

    @property
    def num_points(self) -> int:
        return self.point_pos.shape[0]

    @property
    def action_dim(self) -> int:
        return int(self.movable.sum()) * 3


def _contact_points(cm: CharacterModel):
    """Candidate contact points per collision geom.

    sphere -> center (radius r); capsule -> 2 axis endpoints (radius r);
    box -> 8 corners (small margin radius).  All expressed in link frame.
    """
    from ..maths import quaternion as quatmod
    import jax.numpy as jnp

    pts_body, pts_pos, pts_r = [], [], []
    for g in range(cm.geom_link.shape[0]):
        body = int(cm.geom_link[g]) + 1
        gq = cm.geom_quat[g]
        gp = cm.geom_pos[g]
        R = np.asarray(quatmod.to_matrix(jnp.asarray(gq)))
        t = cm.geom_type[g]
        if t == GEOM_SPHERE:
            local = [np.zeros(3)]
            r = cm.geom_size[g, 0]
        elif t == GEOM_CAPSULE:
            hl = cm.geom_size[g, 1]
            local = [np.array([0, 0, hl]), np.array([0, 0, -hl])]
            r = cm.geom_size[g, 0]
        elif t == GEOM_BOX:
            he = cm.geom_size[g]
            local = [he * np.array(s)
                     for s in [(1, 1, 1), (1, 1, -1), (1, -1, 1), (1, -1, -1),
                               (-1, 1, 1), (-1, 1, -1), (-1, -1, 1),
                               (-1, -1, -1)]]
            r = 0.0
        else:
            continue
        for x in local:
            pts_body.append(body)
            pts_pos.append(R @ x + gp)
            pts_r.append(r)
    return (np.asarray(pts_body, dtype=np.int32), np.stack(pts_pos),
            np.asarray(pts_r))


def build_model(cm: CharacterModel, ci: CharInfo,
                params: SimParams = SimParams()) -> PhysicsModel:
    J = cm.num_joints
    NB = J + 1
    assert ci.num_joints == J

    movable = cm.joint_type != FIXED
    assert np.isin(cm.joint_type[movable], (SPHERICAL, REVOLUTE)).all(), \
        "movable joints must be spherical or revolute"
    # dofs per joint: spherical = 3 (local axes e0,e1,e2), revolute = 1
    # (the URDF joint axis) — reference handles both generically
    # (sim_agent.py:118-129, :744-766).
    joint_ndof = np.where(movable,
                          np.where(cm.joint_type == REVOLUTE, 1, 3), 0)

    joint_dof_start = np.full(J, -1, dtype=np.int32)
    nv = 6
    for j in range(J):
        if movable[j]:
            joint_dof_start[j] = nv
            nv += int(joint_ndof[j])

    body_parent = np.concatenate([[-1], cm.parent + 1]).astype(np.int32)

    mass = np.concatenate([[cm.base_mass], cm.mass])
    com = np.concatenate([cm.base_com[None], cm.com])
    inertia = np.concatenate([cm.base_inertia[None], cm.inertia])

    dof_body = np.zeros(nv, dtype=np.int32)
    dof_joint = np.full(nv, -1, dtype=np.int32)
    dof_axis_local = np.zeros((nv, 3))
    dof_is_ang = np.zeros(nv, dtype=bool)
    dof_axis_local[:6] = np.tile(np.eye(3), (2, 1))
    dof_is_ang[3:6] = True
    for j in range(J):
        s = joint_dof_start[j]
        if s < 0:
            continue
        n = int(joint_ndof[j])
        dof_body[s:s + n] = j + 1
        dof_joint[s:s + n] = j
        if n == 3:
            dof_axis_local[s:s + 3] = np.eye(3)
        else:
            ax = np.asarray(cm.joint_axis[j], dtype=np.float64)
            dof_axis_local[s] = ax / max(np.linalg.norm(ax), 1e-12)
        dof_is_ang[s:s + n] = True

    # Ancestor masks
    anc = np.zeros((NB, nv), dtype=bool)
    for k in range(NB):
        anc[k, :6] = True
        b = k
        while b > 0:
            j = b - 1
            s = joint_dof_start[j]
            if s >= 0:
                anc[k, s:s + int(joint_ndof[j])] = True
            b = body_parent[b]

    # Movable-joint <-> dof maps for the actuation/velocity projections:
    # mov_dof_T[m, d, :] = local axis of dof 6+d when it belongs to the
    # m-th movable joint, else 0.  Spherical axes are orthonormal per
    # joint, so the same tensor maps joint-space (m,3) vectors to dof
    # scalars (projection) and back (scatter).
    mov_joints = np.where(movable)[0].astype(np.int32)
    nvm = nv - 6
    mov_dof_T = np.zeros((len(mov_joints), nvm, 3))
    for d in range(nvm):
        m = int(np.searchsorted(mov_joints, dof_joint[6 + d]))
        mov_dof_T[m, d] = dof_axis_local[6 + d]
    # anc_pair[d,e]: e is an ancestor-or-self dof of d AND e < d (strict
    # lower triangle; valid because joints are topologically ordered).  The
    # CRBA assembly adds the transpose and the diagonal separately.
    anc_pair = np.zeros((nv, nv), dtype=bool)
    for d in range(nv):
        anc_pair[d] = anc[dof_body[d]] & (np.arange(nv) < d)

    # Gains per dof (char-info per-joint gains broadcast to 3 axes,
    # reference sim_agent.py:156-185)
    kp = np.zeros(nv)
    kd = np.zeros(nv)
    kp_pd = np.zeros(nv)
    kd_pd = np.zeros(nv)
    max_force = np.zeros(nv)
    damping = np.zeros(nv)
    ci_kp_pd = getattr(ci, "kp_pd", ci.kp)
    ci_kd_pd = getattr(ci, "kd_pd", ci.kd)
    for j in range(J):
        s = joint_dof_start[j]
        if s < 0:
            continue
        n = int(joint_ndof[j])
        kp[s:s + n] = ci.kp[j]
        kd[s:s + n] = ci.kd[j]
        kp_pd[s:s + n] = ci_kp_pd[j]
        kd_pd[s:s + n] = ci_kd_pd[j]
        max_force[s:s + n] = ci.max_force[j]
        damping[s:s + n] = params.joint_damping

    # Depth levels over joints (body depth = joint depth + 1; base = 0)
    depth = np.zeros(NB, dtype=np.int32)
    for b in range(1, NB):
        depth[b] = depth[body_parent[b]] + 1
    levels = tuple(
        np.asarray([j for j in range(J) if depth[j + 1] == d],
                   dtype=np.int32)
        for d in range(1, depth.max() + 1))

    point_body, point_pos, point_radius = _contact_points(cm)

    from .self_collision import build_capsules, build_pair_list_raw
    cap_a, cap_b, cap_r = build_capsules(cm)
    self_pairs = build_pair_list_raw(
        body_parent, ci.collision_ignore_pairs)
    link_contact_allow = np.concatenate(
        [[ci.root_contact_allow], ci.contact_allow])
    point_allow = link_contact_allow[point_body]

    joint_weight = np.concatenate([[ci.root_joint_weight], ci.joint_weight])

    model = PhysicsModel(
        params=params,
        num_joints=J,
        num_bodies=NB,
        nv=nv,
        body_parent=body_parent,
        joint_type=cm.joint_type,
        joint_pos=cm.joint_pos,
        joint_quat=cm.joint_quat,
        movable=movable,
        joint_dof_start=joint_dof_start,
        mass=mass,
        com=com,
        inertia=inertia,
        dof_body=dof_body,
        dof_joint=dof_joint,
        dof_axis_local=dof_axis_local,
        joint_ndof=joint_ndof.astype(np.int32),
        mov_joints=mov_joints,
        mov_dof_T=mov_dof_T,
        dof_is_ang=dof_is_ang,
        anc=anc,
        anc_pair=anc_pair,
        kp=kp,
        kd=kd,
        kp_pd=kp_pd,
        kd_pd=kd_pd,
        cpd_ratio=float(getattr(ci, "cpd_ratio", 1.0)),
        max_force=max_force,
        damping=damping,
        point_body=point_body,
        point_pos=point_pos,
        point_radius=point_radius,
        point_allow=point_allow,
        cap_a=cap_a,
        cap_b=cap_b,
        cap_r=cap_r,
        self_pairs=self_pairs,
        levels=levels,
        link_contact_allow=link_contact_allow,
        joint_weight=joint_weight,
        end_effectors=np.asarray(ci.end_effectors, dtype=np.int32) + 1,
        v_up=ci.v_up,
        v_face=ci.v_face,
        v_up_env=ci.v_up_env,
    )
    # One-time TPU-lowering probe of the default-on Pallas kernels: a
    # kernel that stops lowering on this toolchain downgrades its flag to
    # the XLA path (with a warning) instead of crashing every TPU run —
    # the round-3 failure class (ops/probe.py).
    from ..ops.probe import apply_kernel_probe
    return apply_kernel_probe(model)


def load_loco_model(project_dir: str = "/root/reference",
                    params: SimParams = SimParams()) -> PhysicsModel:
    """Convenience loader for the reference loco character."""
    import os

    from ..kinematics.urdf import load_urdf
    from ..kinematics.char_info import load_char_info

    cm = load_urdf(os.path.join(project_dir, "data/character/urdf/loco.urdf"))
    ci = load_char_info(
        os.path.join(project_dir, "data/character/info/loco_char_info.py"))
    return build_model(cm, ci, params)
