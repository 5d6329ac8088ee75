"""Simulation stepping: stable-PD actuation fused into the implicit solve,
contact impulses, semi-implicit Euler integration, control-step substepping.

Replaces the reference hot loop `num_substep x {actuate; stepSimulation}`
(envs/env_humanoid_tracking.py:375-413) and Bullet's STABLE_PD_CONTROL
(sim_agent.py:694-703).  Stable PD follows Tan et al.: the damping term is
implicit — (M + dt*Kd) qdd = tau_ext - c - kp*err(q + dt qdot, q_target)
- kd*qdot — which is what makes kp=500 stable at 480 Hz.

TPU design note: all solves use an explicit inverse of the damped mass
matrix, computed exactly once per control step and kept current across the
16 substeps by Newton–Schulz refinement (see physics/linalg.py) — the
factorization-free path keeps the whole substep on the MXU/VPU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..maths import quaternion as quat
from . import contacts as contacts_mod
from .dynamics import dynamics_terms
from .fk import contact_point_positions, fk
from .linalg import ns_inverse, ns_refine, spd_inverse
from .model import PhysicsModel
from .state import SimState, joint_omega


_FORCE_XLA = False


def force_xla_path(on: bool = True) -> None:
    """Globally disable the Pallas kernels (bench.py's last-resort retry
    after a kernel compile/run failure: flip this, jax.clear_caches(),
    rebuild the env, retrace).  The first line of defense is the
    lowering probe at model build (ops/probe.py)."""
    global _FORCE_XLA
    _FORCE_XLA = on


def kernels_on_tpu() -> bool:
    """The opt-in Pallas kernels have no non-interpret CPU lowering; the
    use_* flags only take effect when tracing for a TPU backend (CPU test
    runs and the virtual-mesh multichip dryrun keep the XLA path)."""
    return (not _FORCE_XLA) and jax.default_backend() == "tpu"


class Action(NamedTuple):
    """Per-control-step actuation targets (already denormalized).

    target_q: (...,J,4) target local joint rotations (identity for fixed).
    target_w: (...,J,3) target local joint velocities.
    root_force / root_torque: optional residual root wrench (world frame).
    torque: optional (...,NV) direct torques (TQ actuation mode).
    """
    target_q: jnp.ndarray
    target_w: jnp.ndarray
    root_force: Optional[jnp.ndarray] = None
    root_torque: Optional[jnp.ndarray] = None
    torque: Optional[jnp.ndarray] = None


def hold_action(model: PhysicsModel, batch_shape=()) -> Action:
    return Action(
        target_q=quat.identity(batch_shape + (model.num_joints,)),
        target_w=jnp.zeros(batch_shape + (model.num_joints, 3)),
    )


def _aux_tau(model: PhysicsModel, state: SimState, action: Action):
    """Torques common to every actuation mode: URDF joint damping (explicit),
    residual root wrench (applyExternalForce/Torque, sim_agent.py:582-614),
    and direct torques."""
    tau = -jnp.asarray(model.damping) * state.vel
    if action.root_force is not None:
        tau = tau.at[..., 0:3].add(action.root_force)
    if action.root_torque is not None:
        tau = tau.at[..., 3:6].add(action.root_torque)
    if action.torque is not None:
        tau = tau + action.torque
    return tau


def _joint_err(model: PhysicsModel, joint_q, action: Action):
    """Axis-angle error from the current local joint rotations to the
    targets, per movable joint: (..., n_mov, 3)."""
    mov = jnp.asarray(model.mov_joints)
    err = quat.to_axis_angle(
        quat.mul(quat.conjugate(joint_q), action.target_q))
    return err[..., mov, :], mov


def _dof_project(model: PhysicsModel, vec_mov):
    """(..., n_mov, 3) joint-space vectors -> (..., NV-6) per-dof scalars.

    Spherical joints keep their 3 components; revolute joints project onto
    the joint axis (the reference's project_rotation_1D action mapping,
    sim_agent.py:744-766)."""
    T = jnp.asarray(model.mov_dof_T, dtype=vec_mov.dtype)
    return jnp.einsum("...mi,mdi->...d", vec_mov, T)


def spd_torque(model: PhysicsModel, state: SimState, action: Action, dt):
    """Per-dof stable-PD torque (before the implicit damping solve).

    tau = -kp * err(q advanced by dt*qdot, q_target) - kd * qdot, clamped to
    per-dof max_force (Bullet clamps motor forces the same way,
    sim_agent.py:166-172).
    """
    kp = jnp.asarray(model.kp)
    kd = jnp.asarray(model.kd)
    max_f = jnp.asarray(model.max_force)

    om = joint_omega(model, state)                       # (...,J,3)
    q_adv = quat.integrate(state.joint_q, om, dt)
    # error rotation from advanced pose to target, in the child joint frame
    err_mov, mov = _joint_err(model, q_adv, action)

    t_dof = (kp[6:] * _dof_project(model, err_mov)
             + kd[6:] * _dof_project(
                 model, action.target_w[..., mov, :] - om[..., mov, :]))
    batch = state.vel.shape[:-1]
    tau = jnp.concatenate([jnp.zeros(batch + (6,)), t_dof], axis=-1)
    tau = jnp.clip(tau, -max_f, max_f)
    return tau + _aux_tau(model, state, action)


def pd_torque(model: PhysicsModel, state: SimState, action: Action):
    """Explicit PD torque (Actuation.PD): the reference computes this in
    Python and feeds TORQUE_CONTROL because Bullet's PD motor lacks spherical
    support (bullet/bullet_utils.py:228-263, sim_agent.py:726-739).

    tau = kp_pd * axis_diff(target, q) + kd_pd * (target_w - w), clamped.
    """
    kp = jnp.asarray(model.kp_pd)
    kd = jnp.asarray(model.kd_pd)
    max_f = jnp.asarray(model.max_force)

    om = joint_omega(model, state)
    err_mov, mov = _joint_err(model, state.joint_q, action)
    t_dof = (kp[6:] * _dof_project(model, err_mov)
             + kd[6:] * _dof_project(
                 model, action.target_w[..., mov, :] - om[..., mov, :]))
    batch = state.vel.shape[:-1]
    tau = jnp.concatenate([jnp.zeros(batch + (6,)), t_dof], axis=-1)
    tau = jnp.clip(tau, -max_f, max_f)
    return tau + _aux_tau(model, state, action)


def servo_delta_v(model: PhysicsModel, state: SimState, action: Action,
                  v_pred, Minv, dt, mode: str):
    """Constraint-motor modes CPD / CP / V (Bullet POSITION_CONTROL /
    VELOCITY_CONTROL, sim_agent.py:740-766): solve for the joint-dof motor
    impulse that realizes the requested velocity change through the coupled
    inverse mass matrix (the TPU equivalent of Bullet's iterated motor
    constraint rows), clamped per dof to max_force*dt.

    Requested change (Bullet motor semantics, gains in [0,1] acting as
    per-step relaxation): dv = kp_c*err/dt + kd_c*(target_w - v).  Gains are
    cpd_ratio-scaled as the char-info documents (loco_char_info.py:278-282).
    """
    r = model.cpd_ratio
    kp_c = r * jnp.asarray(model.kp[6:])
    kd_c = r * jnp.asarray(model.kd[6:])
    max_f = jnp.asarray(model.max_force[6:])

    err_mov, mov = _joint_err(model, state.joint_q, action)
    batch = state.vel.shape[:-1]
    err = _dof_project(model, err_mov)
    tgt_w = _dof_project(model, action.target_w[..., mov, :])
    v_m = v_pred[..., 6:]

    # Each motor drives the dof velocity toward a target at a gain-scaled
    # rate (Bullet's iterated motor rows converge to the same fixed points):
    # position servo target = err/dt (close the error in one step), velocity
    # servo target = target_w.  The incremental form kp*(err/dt - v) is a
    # contraction — the naive additive kp*err/dt ratchets velocity and blows
    # up, which is why Bullet recomputes the row against the current velocity
    # every solver iteration.
    if mode == "cpd":
        rhs = kp_c * (err / dt - v_m) + kd_c * (tgt_w - v_m)
    elif mode == "cp":
        rhs = kp_c * (err / dt - v_m)
    else:  # "v"
        rhs = kd_c * (tgt_w - v_m)

    # Motor impulse p on joint dofs such that (Minv_mm @ p) ~= rhs, with the
    # ACCUMULATED impulse clamped per dof (Bullet's sequential-impulse motor
    # semantics).  Projected under-relaxed Richardson iteration: stable under
    # the clamp, unlike a one-shot exact solve.
    Minv_mm = Minv[..., 6:, 6:]
    diag = jnp.maximum(jnp.diagonal(Minv_mm, axis1=-2, axis2=-1), 1e-12)
    lim = max_f * dt
    omega = 0.3

    def body(p, _):
        resid = rhs - jnp.einsum("...ij,...j->...i", Minv_mm, p)
        p = jnp.clip(p + omega * resid / diag, -lim, lim)
        return p, None

    p, _ = jax.lax.scan(body, jnp.zeros_like(rhs), None, length=16)
    imp = jnp.concatenate([jnp.zeros(batch + (6,)), p], axis=-1)
    return jnp.einsum("...ij,...j->...i", Minv, imp)


def _hold_inverse_ok(model: PhysicsModel) -> bool:
    """The held-inverse cadence (ns_refine_every=0) is only stable for
    stable-PD: its implicit dt*kd diagonal dominates M_hat, so a
    1/fps_con-stale inverse stays an excellent preconditioner.  The
    barely-damped M_hat of pd/cpd/cp/v/tq/none tracks the pose much more
    tightly — and the cpd/cp/v servo iteration consumes Minv's diagonal
    directly — so a held inverse diverges within a few substeps (found by
    tests/test_actuation_modes.py after the default flip).  Non-spd modes
    always refine every warm substep."""
    return model.params.ns_refine_every == 0 and \
        model.params.actuation == "spd"


def _bf16_inverse_ok(model: PhysicsModel) -> bool:
    """bf16 Newton–Schulz refinement (and the bf16-carried inverse) is only
    safe for stable-PD: its implicit dt*kd diagonal conditions M_hat enough
    that the refinement contracts despite bf16 rounding.  The barely-damped
    M_hat of pd/cpd/cp/v/tq/none modes diverges under bf16 NS (observed as
    NaN within ~50 substeps), so those keep an f32 inverse."""
    return model.params.matmul_bf16 and model.params.actuation == "spd"


def _damped_mass_matrix(model: PhysicsModel, M, dt):
    """LHS damping: stable-PD puts kd on the diagonal (the implicit term that
    makes kp=500 stable at 480 Hz); every mode gets the URDF joint damping."""
    diag = jnp.asarray(model.damping)
    if model.params.actuation == "spd":
        diag = diag + jnp.asarray(model.kd)
    return M + dt * jnp.diag(diag)


_FUSED_DYN_CACHE = {}


def _fused_dynamics(model: PhysicsModel, lean: bool = False):
    """custom_vmap dispatch for the fused kinematics+dynamics kernel:
    unbatched calls fall back to the XLA path; vmapped calls run ONE
    Pallas program (ops/dyn_kernel.py) — same pattern as physics/fk.fk.

    lean=True (held-inverse warm substeps): the mass matrix is dead, so
    the kernel skips the S / I_sp / V / com / body-velocity writes and
    returns only (FKResult-with-None-velocity-fields, c, x)."""
    key = (id(model), lean)
    if key in _FUSED_DYN_CACHE:
        return _FUSED_DYN_CACHE[key]

    from jax import custom_batching

    import dataclasses as _dc

    from .dynamics import dynamics_terms_split
    from .fk import _fk_xla

    from ..ops.dyn_kernel import _wants_self_fuse

    fuse_self = _wants_self_fuse(model)

    @custom_batching.custom_vmap
    def _f(root_p, root_q, joint_q, vel):
        state = SimState(root_p, root_q, joint_q, vel)
        k = _fk_xla(model, state)
        S, I_sp, V, c = dynamics_terms_split(model, state, k)
        x, _ = contact_point_positions(model, k)
        sc = None
        if fuse_self:
            from .self_collision import self_pair_features
            sc = self_pair_features(model, k)
        if lean:
            # same pytree structure as the kernel rule; XLA DCEs the rest
            k = _dc.replace(k, body_com=None, body_w=None,
                            body_vcom=None, body_vo=None)
            return k, c, x, sc
        return k, S, I_sp, V, c, x, sc

    @_f.def_vmap
    def _rule(axis_size, in_batched, root_p, root_q, joint_q, vel):
        from ..ops.dyn_kernel import (dynamics_terms_fused,
                                      dynamics_terms_fused_lean)
        state = SimState(root_p, root_q, joint_q, vel)
        out = (dynamics_terms_fused_lean(model, state) if lean
               else dynamics_terms_fused(model, state))
        return out, jax.tree.map(lambda _: True, out)

    _FUSED_DYN_CACHE[key] = _f
    return _f


def _fused_dynamics_spd(model: PhysicsModel):
    """Lean variant with the stable-PD torque fused in-kernel: returns
    (FKResult-lean, tau - damping*vel - c, x).  Residual root wrenches /
    direct torques are added by the caller in XLA."""
    key = (id(model), "spd")
    if key in _FUSED_DYN_CACHE:
        return _FUSED_DYN_CACHE[key]

    import dataclasses as _dc

    from jax import custom_batching

    from .dynamics import dynamics_terms_split
    from .fk import _fk_xla

    from ..ops.dyn_kernel import _wants_self_fuse

    fuse_self = _wants_self_fuse(model)

    @custom_batching.custom_vmap
    def _f(root_p, root_q, joint_q, vel, target_q, target_w):
        state = SimState(root_p, root_q, joint_q, vel)
        k = _fk_xla(model, state)
        S, I_sp, V, c = dynamics_terms_split(model, state, k)
        x, _ = contact_point_positions(model, k)
        tau = spd_torque(model, state,
                         Action(target_q=target_q, target_w=target_w),
                         model.params.dt_sim)
        sc = None
        if fuse_self:
            from .self_collision import self_pair_features
            sc = self_pair_features(model, k)
        k = _dc.replace(k, body_com=None, body_w=None,
                        body_vcom=None, body_vo=None)
        return k, tau - c, x, sc

    @_f.def_vmap
    def _rule(axis_size, in_batched, root_p, root_q, joint_q, vel,
              target_q, target_w):
        from ..ops.dyn_kernel import dynamics_terms_fused_lean
        state = SimState(root_p, root_q, joint_q, vel)
        target_q = jnp.broadcast_to(
            target_q, (axis_size,) + target_q.shape[-2:]) \
            if not in_batched[4] else target_q
        target_w = jnp.broadcast_to(
            target_w, (axis_size,) + target_w.shape[-2:]) \
            if not in_batched[5] else target_w
        out = dynamics_terms_fused_lean(model, state, target_q, target_w)
        return out, jax.tree.map(lambda _: True, out)

    _FUSED_DYN_CACHE[key] = _f
    return _f


def _ground_selable(ground) -> bool:
    """The fused-selection dispatch closes over the ground, so it must be
    a trace-time constant: a Python/numpy scalar plane height or a
    Heightmap (whose grid arrays are constants).  Traced array heights
    fall back to the batch-major selection path."""
    import numpy as _np
    return (isinstance(ground, (int, float, _np.floating))
            or hasattr(ground, "height_at"))


def _ground_key(ground):
    return (("f", float(ground)) if isinstance(ground, (int, float))
            or hasattr(ground, "dtype") else ("hm", id(ground)))


def _fused_dynamics_sel(model: PhysicsModel, ground, mode: str):
    """custom_vmap dispatch for the fused kernel + IN-RULE feature-major
    contact detection/selection (select-then-transpose): the kernel's
    candidate points (3NP,B) and self-collision narrow phase (7P,B) stay
    in their native feature-major layout through detect_ground_fm /
    topk / one-hot gathers, and only the K selected rows are transposed
    to batch-major.  This removes the 30 MB/substep (B,P,·) relayouts
    and the MXU-padded tiny one-hot einsums of the batch-major path
    (r4 device trace: ~12 ms of a 107 ms 5-control-step trace).

    mode: "spd" (lean + fused stable-PD), "lean", or "full" (cold
    substep, mass-matrix outputs kept).  Returns the same tuple as the
    corresponding _fused_dynamics* dispatch with (x, sc) replaced by
    sel = (GroundSel, SelfSel-or-None), all batch-major."""
    key = (id(model), "sel", mode, _ground_key(ground))
    if key in _FUSED_DYN_CACHE:
        return _FUSED_DYN_CACHE[key]

    import dataclasses as _dc

    from jax import custom_batching

    from .contacts import (GroundSel, SelfSel, detect_ground,
                           detect_ground_fm, select_contacts_fm,
                           select_contacts_oh)
    from .dynamics import dynamics_terms_split
    from .fk import _fk_xla

    from ..ops.dyn_kernel import _wants_self_fuse

    fuse_self = _wants_self_fuse(model)

    def _select_bm(x, sc):
        """Unbatched fallback selection (the existing batch-major
        helpers; bit-identical ranking formula to the fm rule)."""
        depth = detect_ground(model, x, ground)
        cons, _ = select_contacts_oh(model, x, depth)
        gsel = GroundSel(pos=cons.pos, depth=cons.depth, body=cons.body,
                         point_idx=cons.point_idx)
        ssel = None
        if fuse_self:
            from .self_collision import select_self_contacts_oh
            (sp, sn, sd, bi, bj, si), _ = select_self_contacts_oh(model, *sc)
            ssel = SelfSel(pos=sp, normal=sn, depth=sd, body_i=bi,
                           body_j=bj, pair_idx=si)
        return gsel, ssel

    def _fallback_tail(state, k):
        x, _ = contact_point_positions(model, k)
        sc = None
        if fuse_self:
            from .self_collision import self_pair_features
            sc = self_pair_features(model, k)
        return _select_bm(x, sc)

    if mode == "spd":
        @custom_batching.custom_vmap
        def _f(root_p, root_q, joint_q, vel, target_q, target_w):
            state = SimState(root_p, root_q, joint_q, vel)
            k = _fk_xla(model, state)
            S, I_sp, V, c = dynamics_terms_split(model, state, k)
            tau = spd_torque(model, state,
                             Action(target_q=target_q, target_w=target_w),
                             model.params.dt_sim)
            sel = _fallback_tail(state, k)
            k = _dc.replace(k, body_com=None, body_w=None,
                            body_vcom=None, body_vo=None)
            return k, tau - c, sel
    elif mode == "lean":
        @custom_batching.custom_vmap
        def _f(root_p, root_q, joint_q, vel):
            state = SimState(root_p, root_q, joint_q, vel)
            k = _fk_xla(model, state)
            S, I_sp, V, c = dynamics_terms_split(model, state, k)
            sel = _fallback_tail(state, k)
            k = _dc.replace(k, body_com=None, body_w=None,
                            body_vcom=None, body_vo=None)
            return k, c, sel
    else:
        @custom_batching.custom_vmap
        def _f(root_p, root_q, joint_q, vel):
            state = SimState(root_p, root_q, joint_q, vel)
            k = _fk_xla(model, state)
            S, I_sp, V, c = dynamics_terms_split(model, state, k)
            sel = _fallback_tail(state, k)
            return k, S, I_sp, V, c, sel

    def _sel_fm_rule(x_fm, sc_fm):
        """Feature-major selection on the raw kernel rows, then
        transpose only the selected K rows to batch-major."""
        from .self_collision import select_self_contacts_fm
        depth_fm = detect_ground_fm(model, x_fm, ground)
        g = select_contacts_fm(model, x_fm, depth_fm)
        gsel = GroundSel(pos=jnp.transpose(g.pos, (2, 0, 1)),
                         depth=g.depth.T, body=g.body.T,
                         point_idx=g.point_idx.T)
        ssel = None
        if fuse_self:
            s = select_self_contacts_fm(model, sc_fm)
            ssel = SelfSel(pos=jnp.transpose(s.pos, (2, 0, 1)),
                           normal=jnp.transpose(s.normal, (2, 0, 1)),
                           depth=s.depth.T, body_i=s.body_i.T,
                           body_j=s.body_j.T, pair_idx=s.pair_idx.T)
        return gsel, ssel

    from ..ops.dyn_kernel import (_fm_inputs, _sel_raw_outputs,
                                  dynamics_fused_fm)

    if mode == "spd":
        @_f.def_vmap
        def _rule(axis_size, in_batched, root_p, root_q, joint_q, vel,
                  target_q, target_w):
            from ..ops.dyn_kernel import dynamics_terms_fused_lean
            state = SimState(root_p, root_q, joint_q, vel)
            target_q = jnp.broadcast_to(
                target_q, (axis_size,) + target_q.shape[-2:]) \
                if not in_batched[4] else target_q
            target_w = jnp.broadcast_to(
                target_w, (axis_size,) + target_w.shape[-2:]) \
                if not in_batched[5] else target_w
            k, tmc, x_fm, sc_fm = _sel_raw_outputs(
                model, state, lean=True, target_q=target_q,
                target_w=target_w)
            out = (k, tmc, _sel_fm_rule(x_fm, sc_fm))
            return out, jax.tree.map(lambda _: True, out)
    elif mode == "lean":
        @_f.def_vmap
        def _rule(axis_size, in_batched, root_p, root_q, joint_q, vel):
            state = SimState(root_p, root_q, joint_q, vel)
            k, c, x_fm, sc_fm = _sel_raw_outputs(model, state, lean=True)
            out = (k, c, _sel_fm_rule(x_fm, sc_fm))
            return out, jax.tree.map(lambda _: True, out)
    else:
        @_f.def_vmap
        def _rule(axis_size, in_batched, root_p, root_q, joint_q, vel):
            state = SimState(root_p, root_q, joint_q, vel)
            k, S, I_sp, V, c, x_fm, sc_fm = _sel_raw_outputs(
                model, state, lean=False)
            out = (k, S, I_sp, V, c, _sel_fm_rule(x_fm, sc_fm))
            return out, jax.tree.map(lambda _: True, out)

    _FUSED_DYN_CACHE[key] = _f
    return _f


class HeldSelection(NamedTuple):
    """Held contact-selection state for the warm substeps of one control
    step (SimParams.hold_selection): only the top-K slot IDENTITY is
    pinned — which candidate point / self-collision pair occupies which
    contact slot — plus the per-slot APGD step sizes it validates.  All
    physical quantities (positions, depths, normals, Jacobian, M^-1) are
    rebuilt fresh from the current state every substep."""
    g_idx: jnp.ndarray            # (...,K) int32 candidate-point index
    g_body: jnp.ndarray           # (...,K) int32
    s_idx: Optional[jnp.ndarray]  # (...,K2) int32 pair index or None
    s_bi: Optional[jnp.ndarray]   # (...,K2) int32
    s_bj: Optional[jnp.ndarray]   # (...,K2) int32
    invL: jnp.ndarray             # (...,K+K2) carried Gershgorin steps


def _fused_dynamics_hsel(model: PhysicsModel, ground, with_self: bool):
    """custom_vmap dispatch for held-selection warm substeps: the fused
    lean+SPD kernel runs as usual, and the held slots are refreshed by
    IN-RULE feature-major one-hot gathers built on the fly from the held
    indices (no ranking, no (B,P,·) candidate relayout).  Everything
    gathered — positions, depths, self normals — is fresh; only WHICH
    rows are gathered is held.

    Returns (k_lean, tmc, gpos (B,K,3), gdepth (B,K)[, spos, snorm,
    sdepth])."""
    key = (id(model), "hsel", with_self, _ground_key(ground))
    if key in _FUSED_DYN_CACHE:
        return _FUSED_DYN_CACHE[key]

    import dataclasses as _dc

    from jax import custom_batching

    from .contacts import detect_ground, detect_ground_fm
    from .dynamics import dynamics_terms_split
    from .fk import _fk_xla

    import numpy as _np

    K = model.params.num_contacts
    if with_self:
        pairs = _np.asarray(model.self_pairs)
        P_ = pairs.shape[0]
        cap_r = _np.asarray(model.cap_r)
        rsum_np = (cap_r[pairs[:, 0]] + cap_r[pairs[:, 1]]).astype(
            _np.float32)

    if with_self:
        @custom_batching.custom_vmap
        def _f(root_p, root_q, joint_q, vel, target_q, target_w,
               g_idx, s_idx):
            state = SimState(root_p, root_q, joint_q, vel)
            k = _fk_xla(model, state)
            S, I_sp, V, c = dynamics_terms_split(model, state, k)
            tau = spd_torque(model, state,
                             Action(target_q=target_q, target_w=target_w),
                             model.params.dt_sim)
            x, _ = contact_point_positions(model, k)
            depth = detect_ground(model, x, ground)
            NP_ = depth.shape[-1]
            ohg = (g_idx[..., None] == jnp.arange(NP_)).astype(x.dtype)
            gpos = jnp.einsum("...kp,...pf->...kf", ohg, x)
            gdepth = jnp.einsum("...kp,...p->...k", ohg, depth)
            from .self_collision import self_pair_features
            sp_, sn_, sd_ = self_pair_features(model, k)
            ohs = (s_idx[..., None] == jnp.arange(sd_.shape[-1])).astype(
                x.dtype)
            feats = jnp.concatenate([sp_, sn_], axis=-1)
            s = jnp.einsum("...kp,...pf->...kf", ohs, feats)
            sdepth = jnp.einsum("...kp,...p->...k", ohs, sd_)
            k = _dc.replace(k, body_com=None, body_w=None,
                            body_vcom=None, body_vo=None)
            return (k, tau - c, gpos, gdepth,
                    s[..., 0:3], s[..., 3:6], sdepth)

        @_f.def_vmap
        def _rule(axis_size, in_batched, root_p, root_q, joint_q, vel,
                  target_q, target_w, g_idx, s_idx):
            from ..ops.dyn_kernel import _sel_raw_outputs
            state = SimState(root_p, root_q, joint_q, vel)
            target_q = jnp.broadcast_to(
                target_q, (axis_size,) + target_q.shape[-2:]) \
                if not in_batched[4] else target_q
            target_w = jnp.broadcast_to(
                target_w, (axis_size,) + target_w.shape[-2:]) \
                if not in_batched[5] else target_w
            k, tmc, x_fm, sc_fm = _sel_raw_outputs(
                model, state, lean=True, target_q=target_q,
                target_w=target_w)
            B = x_fm.shape[-1]
            NP_ = x_fm.shape[0] // 3
            depth_fm = detect_ground_fm(model, x_fm, ground)   # (NP,B)
            gi = g_idx.T                                       # (K,B)
            iota_np = jax.lax.broadcasted_iota(jnp.int32, (1, NP_, 1), 1)
            ohg = (gi[:, None, :] == iota_np).astype(jnp.float32)
            xr = x_fm.reshape(NP_, 3, B)
            gpos_fm = jnp.sum(ohg[:, :, None, :] * xr[None], axis=1)
            gdep_fm = jnp.sum(ohg * depth_fm[None], axis=1)    # (K,B)
            gpos = jnp.transpose(gpos_fm, (2, 0, 1))
            gdepth = gdep_fm.T

            m = sc_fm.reshape(7, P_, B)
            sdep_all = jnp.asarray(rsum_np)[:, None] - m[0]    # (P,B)
            si = s_idx.T                                       # (K2,B)
            iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, P_, 1), 1)
            ohs = (si[:, None, :] == iota_p).astype(jnp.float32)
            feats = m[1:7]                                     # (6,P,B)
            ssel_fm = jnp.sum(ohs[:, None, :, :] * feats[None], axis=2)
            spos = jnp.transpose(ssel_fm[:, 0:3], (2, 0, 1))
            snorm = jnp.transpose(ssel_fm[:, 3:6], (2, 0, 1))
            sdepth = jnp.sum(ohs * sdep_all[None], axis=1).T
            out = (k, tmc, gpos, gdepth, spos, snorm, sdepth)
            return out, jax.tree.map(lambda _: True, out)
    else:
        @custom_batching.custom_vmap
        def _f(root_p, root_q, joint_q, vel, target_q, target_w, g_idx):
            state = SimState(root_p, root_q, joint_q, vel)
            k = _fk_xla(model, state)
            S, I_sp, V, c = dynamics_terms_split(model, state, k)
            tau = spd_torque(model, state,
                             Action(target_q=target_q, target_w=target_w),
                             model.params.dt_sim)
            x, _ = contact_point_positions(model, k)
            depth = detect_ground(model, x, ground)
            NP_ = depth.shape[-1]
            ohg = (g_idx[..., None] == jnp.arange(NP_)).astype(x.dtype)
            gpos = jnp.einsum("...kp,...pf->...kf", ohg, x)
            gdepth = jnp.einsum("...kp,...p->...k", ohg, depth)
            k = _dc.replace(k, body_com=None, body_w=None,
                            body_vcom=None, body_vo=None)
            return k, tau - c, gpos, gdepth

        @_f.def_vmap
        def _rule(axis_size, in_batched, root_p, root_q, joint_q, vel,
                  target_q, target_w, g_idx):
            from ..ops.dyn_kernel import _sel_raw_outputs
            state = SimState(root_p, root_q, joint_q, vel)
            target_q = jnp.broadcast_to(
                target_q, (axis_size,) + target_q.shape[-2:]) \
                if not in_batched[4] else target_q
            target_w = jnp.broadcast_to(
                target_w, (axis_size,) + target_w.shape[-2:]) \
                if not in_batched[5] else target_w
            k, tmc, x_fm, sc_fm = _sel_raw_outputs(
                model, state, lean=True, target_q=target_q,
                target_w=target_w)
            B = x_fm.shape[-1]
            NP_ = x_fm.shape[0] // 3
            depth_fm = detect_ground_fm(model, x_fm, ground)
            gi = g_idx.T
            iota_np = jax.lax.broadcasted_iota(jnp.int32, (1, NP_, 1), 1)
            ohg = (gi[:, None, :] == iota_np).astype(jnp.float32)
            xr = x_fm.reshape(NP_, 3, B)
            gpos_fm = jnp.sum(ohg[:, :, None, :] * xr[None], axis=1)
            gdep_fm = jnp.sum(ohg * depth_fm[None], axis=1)
            out = (k, tmc, jnp.transpose(gpos_fm, (2, 0, 1)), gdep_fm.T)
            return out, jax.tree.map(lambda _: True, out)

    _FUSED_DYN_CACHE[key] = _f
    return _f


def substep_presolve(model: PhysicsModel, state: SimState, action: Action,
                     Minv=None, ground_height=0.0, obstacles=None,
                     refine_iters=None, refine_bf16=None,
                     want_sel: bool = True):
    """Everything before the contact solve: FK, dynamics terms, (refined)
    damped-mass inverse, actuation, predicted velocity, obstacle coupling.

    Returns (k, Minv, v_pred, obstacles, x_pts, sc_feats, sel).  With
    want_sel (default) on the fused TPU path, contact detection +
    selection run feature-major inside the kernel dispatch and `sel`
    carries the selected contacts ((GroundSel, SelfSel|None)); x_pts and
    sc_feats are then None.  Callers that need the raw candidates (held-
    contact refresh, obstacle coupling, multi-agent) pass want_sel=False.
    Split out so multi-agent scenes can couple inter-agent contacts on
    v_pred BEFORE integration (physics/multi_agent.py scene_step).
    """
    p = model.params
    dt = p.dt_sim

    n_refine = p.ns_iters if refine_iters is None else refine_iters
    # Held-inverse warm substeps never touch the mass matrix: use the lean
    # kernel (no S/I_sp/V/com/velocity writes — Pallas outputs are not
    # XLA-DCE-able).  Whether a substep is warm is static (refine_iters is
    # a Python int; Minv-ness is structural), so this is a trace-time pick.
    # For stable-PD the torque is fused in-kernel too (tmc = tau - c).
    lean = Minv is not None and n_refine == 0 and p.fuse_warm_kernel
    tmc = None
    sc_feats = None
    sel = None
    x_pts = None
    use_sel = (want_sel and obstacles is None and p.fuse_selection
               and _ground_selable(ground_height))
    if p.use_fused_dynamics and kernels_on_tpu():
        if lean and p.actuation == "spd":
            fd = (_fused_dynamics_sel(model, ground_height, "spd")
                  if use_sel else _fused_dynamics_spd(model))
            out = fd(state.root_p, state.root_q, state.joint_q, state.vel,
                     action.target_q, action.target_w)
            if use_sel:
                k, tmc, sel = out
            else:
                k, tmc, x_pts, sc_feats = out
            if action.root_force is not None:
                tmc = tmc.at[..., 0:3].add(action.root_force)
            if action.root_torque is not None:
                tmc = tmc.at[..., 3:6].add(action.root_torque)
            if action.torque is not None:
                tmc = tmc + action.torque
            M = None
        elif lean:
            fd = (_fused_dynamics_sel(model, ground_height, "lean")
                  if use_sel else _fused_dynamics(model, lean=True))
            out = fd(state.root_p, state.root_q, state.joint_q, state.vel)
            if use_sel:
                k, c, sel = out
            else:
                k, c, x_pts, sc_feats = out
            M = None
        else:
            fd = (_fused_dynamics_sel(model, ground_height, "full")
                  if use_sel else _fused_dynamics(model))
            out = fd(state.root_p, state.root_q, state.joint_q, state.vel)
            if use_sel:
                k, S, I_sp, V, c, sel = out
            else:
                k, S, I_sp, V, c, x_pts, sc_feats = out
            from .dynamics import mass_matrix
            M = mass_matrix(model, S, I_sp)
    else:
        k = fk(model, state)
        S, M, c = dynamics_terms(model, state, k)
    if Minv is None:
        M_hat = _damped_mass_matrix(model, M, dt)
        # NS cold inverse only for stable-PD: its implicit dt*kd diagonal
        # keeps the equilibrated condition number ~250 (22 iters converge).
        # The barely-damped M_hat of pd/cpd/cp/v/tq/none needs far more NS
        # iterations than a Cholesky costs, so those modes keep the exact
        # factorization (they are reference-parity paths, not the perf path).
        if p.cold_inverse == "ns" and p.actuation == "spd":
            Minv = ns_inverse(M_hat, iters=p.ns_cold_iters)
        else:
            Minv = spd_inverse(M_hat)
    elif n_refine > 0:
        M_hat = _damped_mass_matrix(model, M, dt)
        Minv = ns_refine(
            M_hat, Minv, iters=n_refine,
            bf16=_bf16_inverse_ok(model) if refine_bf16 is None
            else refine_bf16)
    # else (ns_refine_every == 0 warm substeps): hold the carried inverse;
    # M and M_hat are then dead code and XLA DCEs the mass-matrix build.

    mode = p.actuation
    if tmc is None:
        if mode == "spd":
            tau = spd_torque(model, state, action, dt)
        elif mode == "pd":
            tau = pd_torque(model, state, action)
        else:  # cpd / cp / v / tq / none: motor handled below or absent
            tau = _aux_tau(model, state, action)
        tmc = tau - c
    if p.matmul_bf16:
        qdd = jnp.einsum("...ij,...j->...i", Minv.astype(jnp.bfloat16),
                         tmc.astype(jnp.bfloat16),
                         preferred_element_type=state.vel.dtype)
    else:
        qdd = jnp.einsum("...ij,...j->...i", Minv, tmc)
    v_pred = state.vel + dt * qdd
    if mode in ("cpd", "cp", "v"):
        v_pred = v_pred + servo_delta_v(model, state, action, v_pred, Minv,
                                        dt, mode)

    # NOTE: dynamic obstacles now couple through the unified contact solve
    # (solve_ground_self) rather than an ad-hoc impulse exchange here.
    return k, Minv, v_pred, obstacles, x_pts, sc_feats, sel


def _assemble_char_contacts(model: PhysicsModel, k, ground_height=0.0,
                            x_pts=None, sc_feats=None, sel=None):
    """Ground + self-collision contact assembly: detection, top-K selection,
    Jacobian build.  Returns (J, cons, normals, mu, (oh_ground, oh_self))
    where the one-hots are the selection gather matrices the held-contact
    cadence reuses to refresh depths (oh_self is None without
    self-collision).

    sel: pre-selected contacts from the feature-major fused-selection
    dispatch (substep_presolve want_sel path) — detection and selection
    are then skipped and no one-hots are returned."""
    p = model.params
    if sel is not None:
        gsel, ssel = sel
        cons = contacts_mod.Contacts(
            pos=gsel.pos, depth=gsel.depth, active=gsel.depth > 0.0,
            body=gsel.body, point_idx=gsel.point_idx)
        oh_g = oh_s = None
    else:
        x = x_pts if x_pts is not None else \
            contact_point_positions(model, k)[0]
        depth = contacts_mod.detect_ground(model, x, ground_height)
        cons, oh_g = contacts_mod.select_contacts_oh(model, x, depth)
        oh_s = None
    J = contacts_mod.contact_jacobian(model, k, cons)
    normals = jnp.broadcast_to(jnp.asarray(model.v_up_env, J.dtype),
                               cons.depth.shape + (3,))
    mu = jnp.full(cons.depth.shape, p.mu)
    if p.self_collision and model.self_pairs.shape[0] > 0:
        # capsule-capsule self contacts join the same impulse solve;
        # the narrow phase comes from the fused dynamics kernel when
        # available (sc_feats), with only the top-K2 selection in XLA
        from .self_collision import (pair_jacobian, self_pair_features,
                                     select_self_contacts_oh)
        if sel is not None and sel[1] is not None:
            _, ssel = sel
            sp, sn, sd = ssel.pos, ssel.normal, ssel.depth
            bi, bj = ssel.body_i, ssel.body_j
        else:
            # sel without ssel: fuse_self_narrow off — XLA narrow phase
            if sc_feats is None:
                sc_feats = self_pair_features(model, k)
            (sp, sn, sd, bi, bj, _), oh_s = select_self_contacts_oh(
                model, *sc_feats)
        Js = pair_jacobian(model, k, sp, bi, bj)
        J = jnp.concatenate([J, Js], axis=-3)
        normals = jnp.concatenate([normals, sn], axis=-2)
        cons = contacts_mod.Contacts(
            pos=jnp.concatenate([cons.pos, sp], axis=-2),
            depth=jnp.concatenate([cons.depth, sd], axis=-1),
            active=jnp.concatenate([cons.active, sd > 0.0], axis=-1),
            body=jnp.concatenate([cons.body, bi], axis=-1),
            point_idx=jnp.concatenate(
                [cons.point_idx, -jnp.ones_like(bi)], axis=-1),
        )
        # Bullet combines friction multiplicatively: char-char = mu^2
        mu = jnp.concatenate(
            [mu, jnp.full(sd.shape, p.mu * p.mu)], axis=-1)
    return J, cons, normals, mu, (oh_g, oh_s)


def _hold_contacts_ok(model: PhysicsModel, obstacles) -> bool:
    """The held-contact cadence shares the held-inverse preconditions
    (stable-PD, ns_refine_every=0) and additionally requires no dynamic
    obstacles: thrown boxes cross a contact margin in a few substeps, so
    their rows must be re-detected every substep (the fallback path).
    The rebuild cadence must tile the substep count exactly."""
    p = model.params
    return (p.hold_contacts and obstacles is None
            and p.hold_contacts_every >= 1
            and p.num_substeps % p.hold_contacts_every == 0
            and _hold_inverse_ok(model))


class HeldContacts(NamedTuple):
    """Loop-invariant contact solve state for the warm substeps of one
    control step: the operator (Jacobian/Delassus/cone) plus the selection
    one-hots used to refresh the held slots' depths."""
    op: contacts_mod.ContactOperator
    oh_ground: jnp.ndarray           # (...,K,NP)
    oh_self: Optional[jnp.ndarray]   # (...,K2,P) or None


def _substep_held_first(model: PhysicsModel, state: SimState, action: Action,
                        Minv, ground_height=0.0, refine_iters=None,
                        refine_bf16=None, lam_warm=None):
    """Operator-rebuild substep of a held-contact control step: full
    detection + selection + operator build; returns the HeldContacts the
    following warm substeps reuse.  (state', Minv, lam, held)."""
    dt = model.params.dt_sim
    k, Minv, v_pred, _, x_pts, sc_feats, _ = substep_presolve(
        model, state, action, Minv, ground_height, None,
        refine_iters, refine_bf16, want_sel=False)
    J, cons, normals, mu, (oh_g, oh_s) = _assemble_char_contacts(
        model, k, ground_height, x_pts, sc_feats)
    op = contacts_mod.build_operator(model, Minv, J, v_pred.dtype,
                                     normals=normals, mu=mu)
    dv, lam = contacts_mod.solve_with_operator(
        model, op, v_pred, cons.depth, cons.active, dt, lam_warm=lam_warm)
    new_state = integrate(model, state, v_pred + dv, dt)
    return new_state, Minv, lam, HeldContacts(op, oh_g, oh_s)


def _held_warm_scan(model: PhysicsModel, state: SimState, action: Action,
                    Minv, held: HeldContacts, lam, ground_height, length):
    """Scan `length` warm substeps against a held contact operator."""
    if length <= 0:
        return state, lam

    def body(carry, _):
        st, lm = carry
        st, lm = _substep_held_warm(model, st, action, Minv, held, lm,
                                    ground_height)
        return (st, lm), None

    (state, lam), _ = jax.lax.scan(body, (state, lam), None, length=length)
    return state, lam


def _substep_held_warm(model: PhysicsModel, state: SimState, action: Action,
                       Minv, held: HeldContacts, lam_warm,
                       ground_height=0.0):
    """Warm substep against a held contact operator: fresh candidate
    positions (the fused kernel produces them anyway) refresh only the held
    slots' penetration depths via the selection one-hots; J, the Delassus
    operator, and the cone bases stay 1/fps_con-stale at most (the same
    staleness contract as the held mass inverse).  (state', lam)."""
    dt = model.params.dt_sim
    k, _, v_pred, _, x_pts, sc_feats, _ = substep_presolve(
        model, state, action, Minv, ground_height, None, refine_iters=0,
        want_sel=False)
    x = x_pts if x_pts is not None else \
        contact_point_positions(model, k)[0]
    depth_all = contacts_mod.detect_ground(model, x, ground_height)
    d = jnp.einsum("...kp,...p->...k", held.oh_ground, depth_all)
    if held.oh_self is not None:
        if sc_feats is None:
            from .self_collision import self_pair_features
            sc_feats = self_pair_features(model, k)
        d_self = jnp.einsum("...kp,...p->...k", held.oh_self, sc_feats[2])
        d = jnp.concatenate([d, d_self], axis=-1)
    active = d > 0.0
    dv, lam = contacts_mod.solve_with_operator(
        model, held.op, v_pred, d, active, dt, lam_warm=lam_warm)
    new_state = integrate(model, state, v_pred + dv, dt)
    return new_state, lam


def _mf_ok(model: PhysicsModel, obstacles) -> bool:
    """The matrix-free warm solve (contacts.solve_contacts_mf) applies on
    the held-inverse perf path without dynamic obstacles (obstacle rows
    add free-body Delassus diagonals + relative-velocity offsets the MF
    kernel does not model).  Unlike hold_contacts this changes NO physics
    — every substep re-detects, re-selects, and re-solves against fresh
    J/M^-1; only the APGD step sizes are carried (a preconditioner)."""
    p = model.params
    return (p.use_mf_apgd and obstacles is None
            and kernels_on_tpu() and _hold_inverse_ok(model))


def _substep_mf_first(model: PhysicsModel, state: SimState, action: Action,
                      Minv0, ground_height=0.0, refine_iters=None,
                      refine_bf16=None):
    """Rebuild substep of a matrix-free control step: the usual dense
    assembly + cold APGD, PLUS the per-contact Gershgorin step sizes the
    matrix-free warm substeps carry (remapped by slot identity there).
    Returns (state', Minv, lam, invL, slot_ids)."""
    dt = model.params.dt_sim
    k, Minv, v_pred, _, x_pts, sc_feats, sel = substep_presolve(
        model, state, action, Minv0, ground_height, None,
        refine_iters, refine_bf16)
    J, cons, normals, mu, (oh_g, oh_s) = _assemble_char_contacts(
        model, k, ground_height, x_pts, sc_feats, sel=sel)
    op = contacts_mod.build_operator(model, Minv, J, v_pred.dtype,
                                     normals=normals, mu=mu)
    # 0.9 safety margin: the operator drifts over the next 15 substeps,
    # and APGD needs step <= 1/L for monotone convergence.  Gershgorin is
    # loose, so this costs nothing measurable in residual.
    invL = 0.9 * contacts_mod.gershgorin_invL(op.A)
    dv, lam = contacts_mod.solve_with_operator(
        model, op, v_pred, cons.depth, cons.active, dt)
    new_state = integrate(model, state, v_pred + dv, dt)
    ids = _slot_ids(model, sel, cons, oh_s)
    return new_state, Minv, lam, invL, ids


def _slot_ids(model: PhysicsModel, sel, cons, oh_s):
    """Unified slot-identity vector for the contact rows: candidate index
    for ground rows, NP + pair index for self rows (disjoint ranges)."""
    NP_ = int(np.asarray(model.point_radius).shape[0])
    if sel is not None:
        gsel, ssel = sel
        if ssel is not None:
            return jnp.concatenate(
                [gsel.point_idx, NP_ + ssel.pair_idx], axis=-1)
        return gsel.point_idx
    K = min(model.params.num_contacts, NP_)
    ids = cons.point_idx[..., :K]
    if oh_s is not None:
        s_idx = jnp.argmax(oh_s, axis=-1).astype(jnp.int32)
        ids = jnp.concatenate([ids, NP_ + s_idx], axis=-1)
    return ids


def _match_carry(ids_new, ids_prev, invL_prev, lam_prev):
    """Remap the carried per-slot APGD state by CONTACT IDENTITY: slot k
    of the fresh selection inherits the step size / warm-start impulse of
    whichever previous slot held the same candidate/pair.  Unmatched new
    slots (a contact that just appeared) start at lam=0 with the most
    conservative carried step size — exactly the r4 failure mode of the
    pure matrix-free path ('carried per-slot Gershgorin steps are
    misassigned when top-K selection reorders slots', docs/PERF_r4.md)
    repaired without holding the selection."""
    f32 = invL_prev.dtype
    Mm = (ids_new[..., :, None] == ids_prev[..., None, :]).astype(f32)
    invL = jnp.einsum("...ko,...o->...k", Mm, invL_prev)
    matched = jnp.sum(Mm, axis=-1)
    safe = jnp.min(invL_prev, axis=-1, keepdims=True)
    invL = jnp.where(matched > 0, invL, safe)
    lam0 = jnp.einsum("...ko,...oi->...ki", Mm,
                      lam_prev.astype(f32)).astype(lam_prev.dtype)
    return invL, lam0


def _substep_mf_warm(model: PhysicsModel, state: SimState, action: Action,
                     Minv, invL, lam_warm, ids_prev, ground_height=0.0):
    """Warm substep with the matrix-free contact solve: fresh detection,
    selection, Jacobian, and M^-1 action every substep — the Delassus
    operator is just never materialized — with the carried per-slot state
    (Gershgorin steps + warm-start impulses) remapped by contact
    IDENTITY, so top-K slot reordering cannot misassign them.
    (state', lam, invL', ids')."""
    dt = model.params.dt_sim
    k, _, v_pred, _, x_pts, sc_feats, sel = substep_presolve(
        model, state, action, Minv, ground_height, None, refine_iters=0)
    J, cons, normals, mu, (oh_g, oh_s) = _assemble_char_contacts(
        model, k, ground_height, x_pts, sc_feats, sel=sel)
    ids = _slot_ids(model, sel, cons, oh_s)
    invL, lam0 = _match_carry(ids, ids_prev, invL, lam_warm)
    dv, lam = contacts_mod.solve_contacts_mf(
        model, Minv, J, v_pred, cons.depth, cons.active, dt,
        lam0, invL, normals, mu)
    new_state = integrate(model, state, v_pred + dv, dt)
    return new_state, lam, invL, ids


def _mf_warm_scan(model: PhysicsModel, state: SimState, action: Action,
                  Minv, invL, lam, ids, ground_height, length):
    """Scan `length` matrix-free warm substeps (Minv loop-invariant,
    closed over; per-slot invL/lam/ids remapped by identity each
    substep)."""
    def body(carry, _):
        st, lm, iL, idp = carry
        st, lm, iL, idp = _substep_mf_warm(model, st, action, Minv, iL,
                                           lm, idp, ground_height)
        return (st, lm, iL, idp), None

    (state, lam, invL, ids), _ = jax.lax.scan(
        body, (state, lam, invL, ids), None, length=length)
    return state, lam


def _hsel_ok(model: PhysicsModel, obstacles) -> bool:
    """Held-selection cadence preconditions: the held-inverse ones
    (stable-PD, ns_refine_every=0), no dynamic obstacles (their rows
    cross the contact margin within a couple of substeps), and a cadence
    that tiles the substep count.  Takes precedence over hold_contacts
    and use_mf_apgd in control_step."""
    p = model.params
    return (p.hold_selection and obstacles is None
            and p.hold_selection_every >= 1
            and p.num_substeps % p.hold_selection_every == 0
            and _hold_inverse_ok(model))


def _hsel_with_self(model: PhysicsModel) -> bool:
    return (model.params.self_collision
            and model.self_pairs.shape[0] > 0)


def _hsel_fused_ok(model: PhysicsModel, ground_height) -> bool:
    """Whether the held-selection warm substep can run the fused-kernel
    feature-major gather dispatch (otherwise: XLA presolve + batch-major
    gathers — same selections, no kernel)."""
    from ..ops.dyn_kernel import _wants_self_fuse
    p = model.params
    return (p.use_fused_dynamics and kernels_on_tpu()
            and p.fuse_warm_kernel and p.fuse_selection
            and _ground_selable(ground_height)
            and p.actuation == "spd"
            and (not _hsel_with_self(model) or _wants_self_fuse(model)))


def _held_sel_from(model: PhysicsModel, cons, sel, oh_s):
    """HeldSelection indices/bodies from a rebuild substep's selection —
    either the fused-selection `sel` tuple or the classic assembly's
    concatenated `cons` + self one-hot."""
    K = min(model.params.num_contacts, int(np.asarray(
        model.point_radius).shape[0]))
    if sel is not None:
        gsel, ssel = sel
        if ssel is not None:
            return (gsel.point_idx, gsel.body, ssel.pair_idx,
                    ssel.body_i, ssel.body_j)
        return gsel.point_idx, gsel.body, None, None, None
    g_idx = cons.point_idx[..., :K]
    g_body = cons.body[..., :K]
    if oh_s is None:
        return g_idx, g_body, None, None, None
    s_idx = jnp.argmax(oh_s, axis=-1).astype(jnp.int32)
    pairs = jnp.asarray(model.self_pairs)
    s_bi = pairs[s_idx, 0]
    s_bj = pairs[s_idx, 1]
    return g_idx, g_body, s_idx, s_bi, s_bj


def _substep_hsel_first(model: PhysicsModel, state: SimState, action: Action,
                        Minv, ground_height=0.0, refine_iters=None,
                        refine_bf16=None, lam_warm=None):
    """Selection-rebuild substep of a held-selection control step: the
    ordinary dense assembly + APGD solve (fused feature-major selection
    when available), PLUS the held slot identity and the per-slot
    Gershgorin step sizes the warm substeps carry.
    Returns (state', Minv, lam, HeldSelection)."""
    dt = model.params.dt_sim
    k, Minv, v_pred, _, x_pts, sc_feats, sel = substep_presolve(
        model, state, action, Minv, ground_height, None,
        refine_iters, refine_bf16)
    J, cons, normals, mu, (oh_g, oh_s) = _assemble_char_contacts(
        model, k, ground_height, x_pts, sc_feats, sel=sel)
    op = contacts_mod.build_operator(model, Minv, J, v_pred.dtype,
                                     normals=normals, mu=mu)
    # 0.9 margin: the Jacobian (hence A's row sums) drifts over the next
    # hold_selection_every-1 substeps; APGD needs step <= 1/L.
    invL = 0.9 * contacts_mod.gershgorin_invL(op.A)
    dv, lam = contacts_mod.solve_with_operator(
        model, op, v_pred, cons.depth, cons.active, dt, lam_warm=lam_warm)
    new_state = integrate(model, state, v_pred + dv, dt)
    g_idx, g_body, s_idx, s_bi, s_bj = _held_sel_from(model, cons, sel,
                                                      oh_s)
    held = HeldSelection(g_idx=g_idx, g_body=g_body, s_idx=s_idx,
                         s_bi=s_bi, s_bj=s_bj, invL=invL)
    return new_state, Minv, lam, held


def _substep_hsel_warm(model: PhysicsModel, state: SimState, action: Action,
                       Minv, held: HeldSelection, lam_warm,
                       ground_height=0.0):
    """Warm substep with HELD SELECTION: positions, depths, normals, the
    Jacobian, and the M^-1 action are all rebuilt fresh from the current
    state — only WHICH candidate/pair occupies each slot is pinned, which
    keeps the carried matrix-free APGD step sizes per-slot-valid and
    deletes the top-K ranking.  (state', lam)."""
    p = model.params
    dt = p.dt_sim
    with_self = _hsel_with_self(model)

    if _hsel_fused_ok(model, ground_height):
        fd = _fused_dynamics_hsel(model, ground_height, with_self)
        if with_self:
            (k, tmc, gpos, gdepth, spos, snorm, sdepth) = fd(
                state.root_p, state.root_q, state.joint_q, state.vel,
                action.target_q, action.target_w, held.g_idx, held.s_idx)
        else:
            k, tmc, gpos, gdepth = fd(
                state.root_p, state.root_q, state.joint_q, state.vel,
                action.target_q, action.target_w, held.g_idx)
        if action.root_force is not None:
            tmc = tmc.at[..., 0:3].add(action.root_force)
        if action.root_torque is not None:
            tmc = tmc.at[..., 3:6].add(action.root_torque)
        if action.torque is not None:
            tmc = tmc + action.torque
        if p.matmul_bf16:
            qdd = jnp.einsum("...ij,...j->...i",
                             Minv.astype(jnp.bfloat16),
                             tmc.astype(jnp.bfloat16),
                             preferred_element_type=state.vel.dtype)
        else:
            qdd = jnp.einsum("...ij,...j->...i",
                             Minv.astype(state.vel.dtype), tmc)
        v_pred = state.vel + dt * qdd
    else:
        k, _, v_pred, _, x_pts, sc_feats, _ = substep_presolve(
            model, state, action, Minv, ground_height, None,
            refine_iters=0, want_sel=False)
        x = x_pts if x_pts is not None else \
            contact_point_positions(model, k)[0]
        depth = contacts_mod.detect_ground(model, x, ground_height)
        NP_ = depth.shape[-1]
        ohg = (held.g_idx[..., None] == jnp.arange(NP_)).astype(x.dtype)
        gpos = jnp.einsum("...kp,...pf->...kf", ohg, x)
        gdepth = jnp.einsum("...kp,...p->...k", ohg, depth)
        spos = snorm = sdepth = None
        if with_self:
            if sc_feats is None:
                from .self_collision import self_pair_features
                sc_feats = self_pair_features(model, k)
            sp_, sn_, sd_ = sc_feats
            ohs = (held.s_idx[..., None]
                   == jnp.arange(sd_.shape[-1])).astype(x.dtype)
            feats = jnp.concatenate([sp_, sn_], axis=-1)
            s = jnp.einsum("...kp,...pf->...kf", ohs, feats)
            spos, snorm = s[..., 0:3], s[..., 3:6]
            sdepth = jnp.einsum("...kp,...p->...k", ohs, sd_)

    gsel = contacts_mod.GroundSel(pos=gpos, depth=gdepth, body=held.g_body,
                                  point_idx=held.g_idx)
    ssel = None
    if with_self:
        ssel = contacts_mod.SelfSel(pos=spos, normal=snorm, depth=sdepth,
                                    body_i=held.s_bi, body_j=held.s_bj,
                                    pair_idx=held.s_idx)
    J, cons, normals, mu, _ = _assemble_char_contacts(
        model, k, ground_height, sel=(gsel, ssel))
    if p.use_pallas_apgd and kernels_on_tpu():
        dv, lam = contacts_mod.solve_contacts_mf(
            model, Minv, J, v_pred, cons.depth, cons.active, dt,
            lam_warm, held.invL, normals, mu)
    else:
        # No MF kernel on this backend: dense rebuild + warm solve (same
        # fixed point; step sizes fresh instead of carried).
        dv, lam = contacts_mod.solve_contacts(
            model, Minv, J, v_pred, cons, dt, normals, mu,
            lam_warm=lam_warm)
    new_state = integrate(model, state, v_pred + dv, dt)
    return new_state, lam


def _hsel_warm_scan(model: PhysicsModel, state: SimState, action: Action,
                    Minv, held: HeldSelection, lam, ground_height, length):
    """Scan `length` held-selection warm substeps (Minv/held loop-
    invariant, closed over)."""
    if length <= 0:
        return state, lam

    def body(carry, _):
        st, lm = carry
        st, lm = _substep_hsel_warm(model, st, action, Minv, held, lm,
                                    ground_height)
        return (st, lm), None

    (state, lam), _ = jax.lax.scan(body, (state, lam), None, length=length)
    return state, lam


def _control_step_hsel(model: PhysicsModel, state: SimState, action: Action,
                       Minv0, ground_height, seed_refine_iters=None):
    """Held-selection control step: rebuild selection every
    hold_selection_every substeps, warm substeps in between.
    Minv0 None -> cold inverse.  Returns (state, Minv)."""
    every = model.params.hold_selection_every
    n_blocks = model.params.num_substeps // every
    if seed_refine_iters is None:
        seed_refine_iters = model.params.seed_refine_iters
    if Minv0 is None:
        state, Minv, lam, held = _substep_hsel_first(
            model, state, action, None, ground_height)
    else:
        state, Minv, lam, held = _substep_hsel_first(
            model, state, action, Minv0.astype(jnp.float32), ground_height,
            refine_iters=seed_refine_iters, refine_bf16=False)
    Minv = Minv.astype(jnp.bfloat16) if _bf16_inverse_ok(model) else Minv
    state, lam = _hsel_warm_scan(model, state, action, Minv, held, lam,
                                 ground_height, every - 1)

    def block(carry, _):
        st, lm = carry
        st, _, lm, held_b = _substep_hsel_first(
            model, st, action, Minv, ground_height, refine_iters=0,
            lam_warm=lm)
        st, lm = _hsel_warm_scan(model, st, action, Minv, held_b, lm,
                                 ground_height, every - 1)
        return (st, lm), None

    if n_blocks > 1:
        (state, _), _ = jax.lax.scan(block, (state, lam), None,
                                     length=n_blocks - 1)
    return state, Minv


def solve_ground_self(model: PhysicsModel, k, Minv, v_pred,
                      ground_height=0.0, lam_warm=None, obstacles=None,
                      x_pts=None, sc_feats=None, sel=None):
    """Ground + self-collision (+ dynamic obstacle) contact assembly and
    ONE unified APGD solve on the predicted velocity.

    Obstacle contacts add Jacobian rows against the 6-dof free body
    (extra 1/m I3 on their Delassus diagonal; relative-velocity offset),
    exactly like Bullet resolving character and obstacles in the same
    sequential-impulse solve.  Returns (dv, lam) or, with obstacles,
    (dv, lam, obstacles') where the pool's velocities carry the reaction
    impulses -lam/m.
    """
    p = model.params
    dt = p.dt_sim

    if sel is not None:
        x = None
        J, cons, normals, mu, _ = _assemble_char_contacts(
            model, k, ground_height, sel=sel)
    else:
        x = x_pts if x_pts is not None else \
            contact_point_positions(model, k)[0]
        J, cons, normals, mu, _ = _assemble_char_contacts(
            model, k, ground_height, x, sc_feats)

    extra_inv_mass = vc_offset = None
    n_char_rows = cons.depth.shape[-1]
    if obstacles is not None:
        from . import obstacles as obstacles_mod
        oc = obstacles_mod.detect_obstacle_contacts(model, obstacles, k,
                                                    x=x)
        oc_cons = contacts_mod.Contacts(
            pos=oc.pos, depth=oc.depth, active=oc.active, body=oc.body,
            point_idx=oc.point_idx)
        Jo = contacts_mod.contact_jacobian(model, k, oc_cons)
        J = jnp.concatenate([J, Jo], axis=-3)
        normals = jnp.concatenate([normals, oc.normal], axis=-2)
        zeros_c = jnp.zeros(cons.depth.shape, dtype=v_pred.dtype)
        extra_inv_mass = jnp.concatenate([zeros_c, oc.inv_mass], axis=-1)
        vc_offset = jnp.concatenate(
            [jnp.zeros(cons.depth.shape + (3,), v_pred.dtype), oc.v_obs],
            axis=-2)
        mu = jnp.concatenate([mu, jnp.full(oc.depth.shape, p.mu)], axis=-1)
        cons = contacts_mod.Contacts(
            pos=jnp.concatenate([cons.pos, oc.pos], axis=-2),
            depth=jnp.concatenate([cons.depth, oc.depth], axis=-1),
            active=jnp.concatenate([cons.active, oc.active], axis=-1),
            body=jnp.concatenate([cons.body, oc.body], axis=-1),
            point_idx=jnp.concatenate([cons.point_idx, oc.point_idx],
                                      axis=-1))

    dv, lam = contacts_mod.solve_contacts(model, Minv, J, v_pred, cons, dt,
                                          normals, mu, lam_warm=lam_warm,
                                          extra_inv_mass=extra_inv_mass,
                                          vc_offset=vc_offset)
    if obstacles is None:
        return dv, lam
    import dataclasses as _dc
    lam_o = lam[..., n_char_rows:, :]
    new_vel = obstacles.vel - lam_o * oc.inv_mass[..., None]
    return dv, lam, _dc.replace(obstacles, vel=new_vel)


def integrate(model: PhysicsModel, state: SimState, vel, dt):
    """Semi-implicit Euler integration with the post-contact velocity."""
    om = joint_omega(model, SimState(state.root_p, state.root_q,
                                     state.joint_q, vel))
    return SimState(
        root_p=state.root_p + dt * vel[..., 0:3],
        root_q=quat.integrate_world(state.root_q, vel[..., 3:6], dt),
        joint_q=quat.integrate(state.joint_q, om, dt),
        vel=vel,
    )


def substep(model: PhysicsModel, state: SimState, action: Action,
            Minv=None, ground_height=0.0, obstacles=None, lam_warm=None,
            refine_iters=None, refine_bf16=None):
    """One physics substep at dt_sim (480 Hz for the loco config).

    Minv: warm-start inverse of the damped mass matrix from the previous
    substep; None -> cold inverse (NS or Cholesky per SimParams).
    obstacles: optional ObstacleState pool, coupled to the character and
    ballistically integrated in presolve (the reference steps obstacle
    bodies in the same stepSimulation, envs/env_humanoid_tracking.py:
    393-407).  lam_warm: previous substep's contact impulses (warm start).
    Returns (state, Minv, obstacles, lam).
    """
    k, Minv, v_pred, obstacles, x_pts, sc_feats, sel = substep_presolve(
        model, state, action, Minv, ground_height, obstacles,
        refine_iters, refine_bf16)
    if obstacles is not None:
        from . import obstacles as obstacles_mod
        dv, lam, obstacles = solve_ground_self(
            model, k, Minv, v_pred, ground_height, lam_warm, obstacles,
            x_pts=x_pts, sc_feats=sc_feats)
        gvec = model.params.gravity * jnp.asarray(model.v_up_env)
        obstacles = obstacles_mod.update(obstacles, model.params.dt_sim,
                                         gvec, v_up=model.v_up_env,
                                         ground_height=ground_height)
    else:
        dv, lam = solve_ground_self(model, k, Minv, v_pred, ground_height,
                                    lam_warm, x_pts=x_pts,
                                    sc_feats=sc_feats, sel=sel)
    new_state = integrate(model, state, v_pred + dv, model.params.dt_sim)
    return new_state, Minv, obstacles, lam


def control_step(model: PhysicsModel, state: SimState, action: Action,
                 ground_height=0.0, obstacles=None):
    """One control step = num_substeps physics substeps under lax.scan
    (mirrors envs/env_humanoid_tracking.py:393-399).

    The first substep factorizes the damped mass matrix exactly; the
    remaining substeps refine the inverse (Newton–Schulz warm start).
    Returns the new SimState, or (SimState, ObstacleState) when an obstacle
    pool is passed.
    """
    if _hsel_ok(model, obstacles):
        state, _ = _control_step_hsel(model, state, action, None,
                                      ground_height)
        return state

    if _hold_contacts_ok(model, obstacles):
        every = model.params.hold_contacts_every
        n_blocks = model.params.num_substeps // every
        state, Minv, lam, held = _substep_held_first(
            model, state, action, None, ground_height)
        Minv_held = Minv.astype(jnp.bfloat16) \
            if _bf16_inverse_ok(model) else Minv
        state, lam = _held_warm_scan(model, state, action, Minv_held,
                                     held, lam, ground_height, every - 1)

        def block(carry, _):
            st, lm = carry
            st, _, lm, held_b = _substep_held_first(
                model, st, action, Minv_held, ground_height,
                refine_iters=0, lam_warm=lm)
            st, lm = _held_warm_scan(model, st, action, Minv_held,
                                     held_b, lm, ground_height, every - 1)
            return (st, lm), None

        if n_blocks > 1:
            (state, _), _ = jax.lax.scan(block, (state, lam), None,
                                         length=n_blocks - 1)
        return state

    if _mf_ok(model, obstacles):
        state, Minv, lam, invL, ids = _substep_mf_first(
            model, state, action, None, ground_height)
        Minv_w = Minv.astype(jnp.bfloat16) \
            if _bf16_inverse_ok(model) else Minv
        state, _ = _mf_warm_scan(model, state, action, Minv_w, invL, lam,
                                 ids, ground_height,
                                 model.params.num_substeps - 1)
        return state

    state, Minv, obstacles2, lam = substep(model, state, action, None,
                                           ground_height, obstacles)

    # With bf16 matmuls on, the warm-started inverse is also CARRIED in bf16
    # (it is consumed as a bf16 matmul input anyway), halving the biggest
    # loop-carried buffer's copy traffic.  Gated to spd (_bf16_inverse_ok).
    def cast_carry(Mi):
        return Mi.astype(jnp.bfloat16) if _bf16_inverse_ok(model) else Mi

    if not _hold_inverse_ok(model):
        def body(carry, _):
            st, Mi, ob, lm = carry
            st, Mi, ob, lm = substep(model, st, action, Mi, ground_height,
                                     ob, lam_warm=lm)
            return (st, cast_carry(Mi), ob, lm), None

        (state, _, obstacles2, _), _ = jax.lax.scan(
            body, (state, cast_carry(Minv), obstacles2, lam), None,
            length=model.params.num_substeps - 1)
    else:
        # held inverse: Minv is loop-INVARIANT — close over it instead of
        # threading it through the scan carry (guarantees XLA never copies
        # the (B,NV,NV) buffer per substep)
        Minv_held = cast_carry(Minv)

        def body(carry, _):
            st, ob, lm = carry
            st, _, ob, lm = substep(model, st, action, Minv_held,
                                    ground_height, ob, lam_warm=lm,
                                    refine_iters=0)
            return (st, ob, lm), None

        (state, obstacles2, _), _ = jax.lax.scan(
            body, (state, obstacles2, lam), None,
            length=model.params.num_substeps - 1)
    if obstacles is None:
        return state
    return state, obstacles2


def control_step_carry(model: PhysicsModel, state: SimState, action: Action,
                       Minv0, ground_height=0.0, obstacles=None,
                       seed_refine_iters: Optional[int] = None):
    """control_step with a CARRIED inverse: no cold factorization at all.

    Minv0 is a seed inverse of the damped mass matrix — either last control
    step's refined inverse (33 ms stale) or, right after an RSI reset, a
    per-frame precomputed entry gathered from the motion DB (bf16 is fine).
    The first substep runs `seed_refine_iters` f32 Newton–Schulz refinements
    (measured: table seeds reach resid 5e-4 by iter 3; same-episode seeds
    are much closer), then the usual warm chain.  This replaces the
    per-control-step cold NS/Cholesky — ~20% of device time in the r3
    trace — with ~6 matmuls.

    Returns (state, Minv_final, obstacles).  Callers that cannot provide a
    seed (plain tracking, fidelity fixtures, non-spd modes) should use
    control_step, which cold-starts.
    """
    if seed_refine_iters is None:
        seed_refine_iters = model.params.seed_refine_iters
    if _hsel_ok(model, obstacles):
        state, Minv = _control_step_hsel(model, state, action, Minv0,
                                         ground_height,
                                         seed_refine_iters=seed_refine_iters)
        return state, Minv, None

    if _hold_contacts_ok(model, obstacles):
        every = model.params.hold_contacts_every
        n_blocks = model.params.num_substeps // every
        state, Minv, lam, held = _substep_held_first(
            model, state, action, Minv0.astype(jnp.float32), ground_height,
            refine_iters=seed_refine_iters, refine_bf16=False)
        Minv = Minv.astype(jnp.bfloat16) \
            if _bf16_inverse_ok(model) else Minv
        state, lam = _held_warm_scan(model, state, action, Minv,
                                     held, lam, ground_height, every - 1)

        def block(carry, _):
            st, lm = carry
            st, _, lm, held_b = _substep_held_first(
                model, st, action, Minv, ground_height,
                refine_iters=0, lam_warm=lm)
            st, lm = _held_warm_scan(model, st, action, Minv,
                                     held_b, lm, ground_height, every - 1)
            return (st, lm), None

        if n_blocks > 1:
            (state, _), _ = jax.lax.scan(block, (state, lam), None,
                                         length=n_blocks - 1)
        return state, Minv, None

    if _mf_ok(model, obstacles):
        state, Minv, lam, invL, ids = _substep_mf_first(
            model, state, action, Minv0.astype(jnp.float32), ground_height,
            refine_iters=seed_refine_iters, refine_bf16=False)
        Minv = Minv.astype(jnp.bfloat16) \
            if _bf16_inverse_ok(model) else Minv
        state, _ = _mf_warm_scan(model, state, action, Minv, invL, lam,
                                 ids, ground_height,
                                 model.params.num_substeps - 1)
        return state, Minv, None

    state, Minv, obstacles2, lam = substep(
        model, state, action, Minv0.astype(jnp.float32), ground_height,
        obstacles, refine_iters=seed_refine_iters, refine_bf16=False)

    def cast_carry(Mi):
        return Mi.astype(jnp.bfloat16) if _bf16_inverse_ok(model) else Mi

    if not _hold_inverse_ok(model):
        def body(carry, _):
            st, Mi, ob, lm = carry
            st, Mi, ob, lm = substep(model, st, action, Mi, ground_height,
                                     ob, lam_warm=lm)
            return (st, cast_carry(Mi), ob, lm), None

        (state, Minv, obstacles2, _), _ = jax.lax.scan(
            body, (state, cast_carry(Minv), obstacles2, lam), None,
            length=model.params.num_substeps - 1)
    else:
        # held inverse: loop-invariant Minv rides in the closure, not the
        # carry (see control_step)
        Minv = cast_carry(Minv)

        def body(carry, _):
            st, ob, lm = carry
            st, _, ob, lm = substep(model, st, action, Minv, ground_height,
                                    ob, lam_warm=lm, refine_iters=0)
            return (st, ob, lm), None

        (state, obstacles2, _), _ = jax.lax.scan(
            body, (state, obstacles2, lam), None,
            length=model.params.num_substeps - 1)
    return state, Minv, obstacles2


def check_ground_contact(model: PhysicsModel, state: SimState,
                         ground_height=0.0, margin=0.0):
    """(disallowed_contact, any_contact) booleans per batch element.

    Used for falldown-by-collision (envs/env_humanoid_tracking.py:278-288).
    """
    k = fk(model, state)
    x, _ = contact_point_positions(model, k)
    depth = contacts_mod.detect_ground(model, x, ground_height)
    touching = depth > -margin
    allow = jnp.asarray(model.point_allow)
    disallowed = jnp.any(touching & ~allow, axis=-1)
    return disallowed, jnp.any(touching, axis=-1)
