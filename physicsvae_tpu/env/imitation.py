"""Motion-imitation environment (DeepMimic/ScaDiver style), TPU-native.

Functional re-build of the reference env stack L2-L4 (envs/env_humanoid_
tracking.py + env_humanoid_base.py + env_humanoid_imitation.py +
rllib_env_imitation.py): `reset`/`step` are pure functions over an EnvState
pytree, vmap-able to thousands of parallel humanoids, with early-termination
(incl. eoe_margin grace) and reference-state initialization done with masks
instead of Python control flow.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..kinematics import motion as motion_mod
from ..kinematics.char_info import load_char_info
from ..kinematics.urdf import load_urdf
from ..maths import quaternion as quat
from ..maths import transforms as tf
from ..physics import fk as fk_mod
from ..physics import model as model_mod
from ..physics import state as state_mod
from ..physics import step as step_mod
from . import obs as obs_mod
from .config import EnvConfig
from .reward import compile_reward, subterm_names


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EnvState:
    sim: state_mod.SimState
    ref_idx: Any          # i32 current reference clip
    start_time: Any       # f32 RSI start time
    elapsed: Any          # f32 elapsed episode time
    eoe_intermediate: Any  # bool: EOE condition hit (grace running)
    time_after_eoe: Any   # f32
    done: Any             # bool: episode over (after eoe_margin)
    rew_queue: Any        # (Q,) recent rewards for low_reward early term
    rew_sum: Any          # f32
    last_reward: Any      # f32
    rng: Any              # PRNG key
    obstacles: Any = None  # ObstacleState pool (None when disabled)
    minv: Any = None      # carried inverse of the damped mass matrix
    #                       (bf16 seed; see control_step_carry)

    def tree_flatten(self):
        return (self.sim, self.ref_idx, self.start_time, self.elapsed,
                self.eoe_intermediate, self.time_after_eoe, self.done,
                self.rew_queue, self.rew_sum, self.last_reward, self.rng,
                self.obstacles, self.minv), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


class ImitationEnv:
    """Host-side container of static data + pure env functions.

    Reference call stack parity: SURVEY.md §3.1.
    """

    def __init__(self, cfg: EnvConfig, physics_overrides=None,
                 kin_fk_table: bool = True):
        self.cfg = cfg
        params = model_mod.SimParams(
            fps_sim=cfg.fps_sim, fps_con=cfg.fps_con,
            actuation=cfg.actuation, self_collision=cfg.self_collision,
            matmul_bf16=cfg.matmul_bf16, apgd_iters=cfg.apgd_iters,
            **(physics_overrides or {}))
        cm = load_urdf(cfg.sim_char_file)
        ci = load_char_info(cfg.char_info_file)
        from ..kinematics.char_info import apply_contactable_body
        ci = apply_contactable_body(ci, cfg.contactable_body)
        self.char_info = ci
        self.cm = cm  # collision geoms (runtime/render.py reads these)
        self.model = model_mod.build_model(cm, ci, params)

        # Base motion: initial posture + Absolute-mode action base pose
        # (envs/env_humanoid_base.py:378-452).
        base = motion_mod.from_bvh_file(cfg.base_motion_file, ci,
                                        scale=cfg.ref_motion_scale)
        self.base_motion = base
        self.base_q0 = base.joint_q[0]           # (J,4) frame-0 local quats

        # Reference motion DB
        clips = [motion_mod.from_bvh_file(f, ci, scale=cfg.ref_motion_scale)
                 for f in cfg.ref_motion_files] or [base]
        self.db = motion_mod.build_db(clips)

        self.height_fix = jnp.asarray(
            cfg.ref_motion_height_fix * ci.v_up_env, dtype=jnp.float32)

        # Terrain: flat plane (0.0) or bilinear heightmap, threaded through
        # contacts, falldown and state builders (reference heightmap path,
        # envs/env_humanoid_tracking.py:157-161, :295-345).
        if cfg.ground_height_map:
            from PIL import Image
            from .ground import Heightmap
            img = Image.open(cfg.ground_height_map).convert("L")
            self.ground = Heightmap.from_image_array(
                img, size=tuple(cfg.ground_size[:2]))
        else:
            self.ground = 0.0

        self.reward_fn = compile_reward(cfg.reward_fn_def)
        self.reward_terms = subterm_names(cfg.reward_fn_def)
        self.lookahead = list(cfg.sensor_lookahead)

        self.dt_con = 1.0 / cfg.fps_con
        self.low_reward_len = int(round(cfg.fps_con * cfg.et_low_reward_duration))
        # rllib horizon (episode step cap); set by the trainer (static)
        self.horizon = None

        # task-state key (exactly one ref_motion_* entry in the loco specs)
        self.task_keys = [c for c in cfg.state_choices if c != "body"]

        md = self.model
        self._build_action_spaces()
        self.dim_state_body = obs_mod.body_state_dim(md, cfg.state_body_type)
        self.dim_state_task = self._task_dim()
        self.dim_state = (
            self.dim_state_body * ("body" in cfg.state_choices)
            + self.dim_state_task)

        # Per-frame inverse mass-matrix table: seeds the carried inverse at
        # RSI resets so the hot loop never cold-factorizes (the cold NS/
        # Cholesky was ~20% of device time in the r3 trace).  bf16 is
        # plenty for a seed (3 f32 refinements reach resid 5e-4).
        self._minv_table = None
        if params.actuation == "spd" and params.carry_minv:
            self._minv_table = self._build_minv_table()

        # Per-frame FK table of the reference motion: the kinematic twin
        # and the sensor-lookahead task states are pure functions of
        # (clip, t) but were re-running the full FK tree sweep 1 +
        # len(lookahead) times per control step (r4 VERDICT weak #3).
        # Precompute FK at every DB frame once on the host and lerp two
        # frames at runtime — same pattern as the minv seed table.
        self._kin_fk_table = self._build_kin_fk_table() if kin_fk_table \
            else None

    def _build_minv_table(self):
        """Computed entirely on the HOST CPU backend (the TPU-tunnel version
        cost 240 s of env-build; CPU does the ~1.5 GFLOP in seconds), then
        uploaded once as a bf16 array."""
        import numpy as np

        from ..physics.dynamics import dynamics_terms
        from ..physics.linalg import spd_inverse

        db = self.db
        dt = self.model.params.dt_sim
        nv = self.model.nv
        # local_devices: under multi-host the global list leads with
        # process 0's devices (non-addressable elsewhere)
        cpu = jax.local_devices(backend="cpu")[0]

        # every 4th frame (0.13 s): seeds tolerate far coarser quantization
        # (3 f32 refinements converge from resid ~12; nearest-frame resid
        # is ~2) and the table upload through the TPU tunnel shrinks 4x.
        stride = self._minv_table_stride = 4
        sub_p = np.asarray(db.root_p)[:, ::stride]
        sub_q = np.asarray(db.root_q)[:, ::stride]
        sub_j = np.asarray(db.joint_q)[:, ::stride]
        NC, T = sub_p.shape[0], sub_p.shape[1]

        flat_p = sub_p.reshape(-1, 3)
        flat_q = sub_q.reshape(-1, 4)
        flat_j = sub_j.reshape(-1, sub_j.shape[-2], 4)

        with jax.default_device(cpu):
            @jax.jit
            def chunk_inv(root_p, root_q, joint_q):
                sim = state_mod.from_pose(self.model, root_p, root_q,
                                          joint_q)
                k = fk_mod.fk(self.model, sim)
                _, M, _ = dynamics_terms(self.model, sim, k)
                M_hat = step_mod._damped_mass_matrix(self.model, M, dt)
                return spd_inverse(M_hat)

            n = NC * T
            chunk = 4096
            pad = (-n) % chunk
            if pad:
                rep = lambda x: np.concatenate(
                    [x, np.repeat(x[-1:], pad, axis=0)], axis=0)
                flat_p, flat_q, flat_j = rep(flat_p), rep(flat_q), rep(flat_j)
            outs = [np.asarray(chunk_inv(flat_p[i:i + chunk],
                                         flat_q[i:i + chunk],
                                         flat_j[i:i + chunk]))
                    for i in range(0, n + pad, chunk)]
        table = np.concatenate(outs, axis=0)[:n].reshape(NC, T, nv, nv)
        return jnp.asarray(table, dtype=jnp.bfloat16)

    def _build_kin_fk_table(self):
        """FK of every reference-DB frame (all clips, padded layout), on
        the host CPU backend, height_fix applied.  Stores only the fields
        the kin-twin consumers read (obs body_state / task errors):
        body_q, body_p, body_com, body_w, body_vcom.  body_q is
        sign-aligned along time so runtime nlerp never crosses
        hemispheres.  ~29 MB f32 for the 10x60s loco DB."""
        import numpy as np

        db = self.db
        NC, T = np.shape(db.root_p)[0], np.shape(db.root_p)[1]
        cpu = jax.local_devices(backend="cpu")[0]

        flat_p = (np.asarray(db.root_p).reshape(-1, 3)
                  + np.asarray(self.height_fix))
        flat_q = np.asarray(db.root_q).reshape(-1, 4)
        flat_j = np.asarray(db.joint_q).reshape(-1,
                                                db.joint_q.shape[-2], 4)
        flat_v = np.asarray(db.root_v).reshape(-1, 3)
        flat_w = np.asarray(db.root_w).reshape(-1, 3)
        flat_jw = np.asarray(db.joint_w).reshape(-1,
                                                 db.joint_w.shape[-2], 3)

        with jax.default_device(cpu):
            @jax.jit
            def chunk_fk(rp, rq, jq, rv, rw, jw):
                sim = state_mod.from_pose(self.model, rp, rq, jq,
                                          rv, rw, jw)
                k = fk_mod._fk_xla(self.model, sim)
                return (k.body_q, k.body_p, k.body_com, k.body_w,
                        k.body_vcom)

            n = NC * T
            chunk = 8192
            outs = []
            for i in range(0, n, chunk):
                sl = slice(i, min(i + chunk, n))
                outs.append([np.asarray(a) for a in chunk_fk(
                    flat_p[sl], flat_q[sl], flat_j[sl],
                    flat_v[sl], flat_w[sl], flat_jw[sl])])
        NB = self.model.num_bodies
        bq, bp, bc, bw, bv = (
            np.concatenate([o[f] for o in outs], axis=0)
            for f in range(5))
        bq = bq.reshape(NC, T, NB, 4)
        # temporal sign alignment per clip/body
        for t in range(1, T):
            flip = (bq[:, t] * bq[:, t - 1]).sum(-1, keepdims=True) < 0
            bq[:, t] = np.where(flip, -bq[:, t], bq[:, t])
        return {
            "body_q": jnp.asarray(bq),
            "body_p": jnp.asarray(bp.reshape(NC, T, NB, 3)),
            "body_com": jnp.asarray(bc.reshape(NC, T, NB, 3)),
            "body_w": jnp.asarray(bw.reshape(NC, T, NB, 3)),
            "body_vcom": jnp.asarray(bv.reshape(NC, T, NB, 3)),
        }

    def kin_fk_at(self, ref_idx, t) -> fk_mod.FKResult:
        """Kinematic-twin FKResult at reference time t via the
        precomputed per-frame table: two gathers + lerp (nlerp for
        orientations; adjacent frames are 1/30 s apart, where nlerp vs
        slerp differs by O(angle^3) ~ 1e-6 rad) instead of a full FK
        tree sweep.  Fields not stored (body_vo, dof_axis, dof_pos) are
        None — no obs/reward consumer reads them."""
        tab = self._kin_fk_table
        i0, i1, a = self.db._frame_weights(ref_idx, t)
        aa = a[..., None, None]

        def lerp(name):
            x = tab[name]
            return (1 - aa) * x[ref_idx, i0] + aa * x[ref_idx, i1]

        body_q = quat.normalize(lerp("body_q"))
        return fk_mod.FKResult(
            body_q=body_q, body_p=lerp("body_p"),
            body_com=lerp("body_com"), body_w=lerp("body_w"),
            body_vcom=lerp("body_vcom"),
            body_vo=None, dof_axis=None, dof_pos=None)

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _build_action_spaces(self):
        """Per-space normalizers + action layout (envs/env_humanoid_base.py:
        217-279): [residual linear force (3)] + [residual angular force (3)]
        + [torque | target pose] — same ordering as the reference step
        (envs/env_humanoid_base.py:566-594)."""
        import numpy as np
        from ..maths.normalizer import Normalizer

        cfg = self.cfg
        md = self.model
        clamp = cfg.action_apply_clamp

        def norm(rmin, rmax, nmin, nmax):
            return Normalizer(np.asarray(rmin, np.float32),
                              np.asarray(rmax, np.float32),
                              np.asarray(nmin, np.float32),
                              np.asarray(nmax, np.float32), clamp)

        dim = 0
        self._norm_lin = self._norm_ang = None
        if cfg.use_base_residual_linear_force:
            self._norm_lin = norm(cfg.range_min_linear_force,
                                  cfg.range_max_linear_force,
                                  cfg.range_min_pol_linear_force,
                                  cfg.range_max_pol_linear_force)
            dim += 3
        if cfg.use_base_residual_angular_force:
            if cfg.base_residual_angular_force_frame != "base":
                raise NotImplementedError(
                    cfg.base_residual_angular_force_frame)
            self._norm_ang = norm(cfg.range_min_angular_force,
                                  cfg.range_max_angular_force,
                                  cfg.range_min_pol_angular_force,
                                  cfg.range_max_pol_angular_force)
            dim += 3

        n_dofs = md.action_dim
        if cfg.actuation == "tq":
            # real range = per-dof max force (envs/env_humanoid_base.py:232-242)
            mf = np.asarray(md.max_force[6:], np.float32)
            self._norm_main = Normalizer(
                -mf, mf,
                np.full(n_dofs, cfg.action_range_min_pol, np.float32),
                np.full(n_dofs, cfg.action_range_max_pol, np.float32), clamp)
        else:
            self._norm_main = norm(
                np.full(n_dofs, cfg.action_range_min, np.float32),
                np.full(n_dofs, cfg.action_range_max, np.float32),
                np.full(n_dofs, cfg.action_range_min_pol, np.float32),
                np.full(n_dofs, cfg.action_range_max_pol, np.float32))
        self.dim_action = dim + n_dofs

    def _task_dim(self) -> int:
        dim = 0
        for key in self.task_keys:
            if key.startswith("ref_motion"):
                inc_abs = "abs" in key
                inc_rel = "rel" in key
                inc_ff = not key.endswith("_noff")
                per = (self.dim_state_body_raw() * (inc_abs + inc_rel)
                       + 6 * inc_ff)
                dim += per * len(self.lookahead)
            elif key == "phase_linear":
                dim += 1
            elif key == "phase_trigon":
                dim += 2
            else:
                raise NotImplementedError(key)
        return dim

    def dim_state_body_raw(self):
        return obs_mod.body_state_dim(self.model, self.cfg.state_body_type)

    def ref_length(self, ref_idx):
        return self.db.length_of(ref_idx)

    def _kin_state(self, ref_idx, t):
        """Kinematic-twin SimState from the reference motion at time t
        (callback_step_after, envs/env_humanoid_imitation.py:111-117)."""
        root_p, root_q, joint_q = self.db.pose_at(ref_idx, t)
        root_v, root_w, joint_w = self.db.velocity_at(ref_idx, t)
        root_p = root_p + self.height_fix
        return state_mod.from_pose(self.model, root_p, root_q, joint_q,
                                   root_v, root_w, joint_w)

    def ref_time(self, st: EnvState):
        t = st.start_time + st.elapsed
        if self.cfg.repeat_ref_motion:
            t = jnp.mod(t, self.ref_length(st.ref_idx))
        return t

    # ------------------------------------------------------------------
    # reset
    # ------------------------------------------------------------------

    def reset(self, rng, ref_motion_id=None, start_time=None,
              add_noise=None) -> EnvState:
        """RSI reset (envs/env_humanoid_imitation.py:84-104, 129-144).

        add_noise: perturb the initial pose/velocities (reference
        add_noise_to_pose_vel path); defaults to the spec's `add_noise`.
        """
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        if ref_motion_id is None:
            ref_idx = jax.random.randint(k1, (), 0, self.db.num_clips)
        else:
            ref_idx = jnp.asarray(ref_motion_id, dtype=jnp.int32)
        if start_time is None:
            if self.cfg.start_time_sampler == "uniform":
                st_time = jax.random.uniform(k2, ()) * self.ref_length(ref_idx)
            else:
                st_time = jnp.asarray(0.0)
        else:
            st_time = jnp.asarray(start_time, dtype=jnp.float32)

        sim = self._kin_state(ref_idx, st_time)
        if add_noise is None:
            add_noise = self.cfg.add_noise
        if add_noise:
            from . import noise as noise_mod
            from ..physics.state import joint_omega, set_joint_omega
            jq, jw = noise_mod.add_noise_to_pose_vel(
                self.model, k3, sim.joint_q, joint_omega(self.model, sim))
            sim = state_mod.SimState(
                sim.root_p, sim.root_q, jq,
                set_joint_omega(self.model, sim.vel, jw))
        if self.cfg.obstacle_num_slots > 0:
            from ..physics import obstacles as obstacles_mod
            pool = obstacles_mod.init_pool(self.cfg.obstacle_num_slots,
                                           v_up=self.model.v_up_env)
        else:
            pool = None
        # Explicit (non-weak) dtypes everywhere: weak-typed scalars would
        # change aval after one scan and silently retrigger compilation.
        f32 = jnp.float32
        return EnvState(
            sim=sim,
            ref_idx=jnp.asarray(ref_idx, jnp.int32),
            start_time=jnp.asarray(st_time, f32),
            elapsed=jnp.zeros((), f32),
            eoe_intermediate=jnp.zeros((), bool),
            time_after_eoe=jnp.zeros((), f32),
            done=jnp.zeros((), bool),
            rew_queue=jnp.ones(self.low_reward_len, f32),
            rew_sum=jnp.zeros((), f32),
            last_reward=jnp.zeros((), f32),
            rng=rng,
            obstacles=pool,
            minv=self._reset_minv(ref_idx, st_time),
        )

    def _reset_minv(self, ref_idx, st_time):
        """Seed inverse for the reset pose: nearest table entry (the table
        is subsampled every `_minv_table_stride` frames)."""
        if self._minv_table is None:
            return None
        s = self._minv_table_stride
        fi = jnp.clip(jnp.round(st_time * self.db.fps / s).astype(jnp.int32),
                      0, self._minv_table.shape[1] - 1)
        return self._minv_table[ref_idx, fi]

    # ------------------------------------------------------------------
    # observation
    # ------------------------------------------------------------------

    def ground_height_under(self, p):
        """Terrain height under world point(s) p (get_ground_height_at,
        envs/env_humanoid_tracking.py:295-345)."""
        if hasattr(self.ground, "height_at"):
            return self.ground.height_at(p[..., 0], p[..., 2])
        return jnp.zeros(p.shape[:-1])

    def observe(self, st: EnvState):
        k_sim = fk_mod.fk(self.model, st.sim)
        gh = self.ground_height_under(st.sim.root_p)
        parts = []
        for key in self.cfg.state_choices:
            if key == "body":
                parts.append(obs_mod.body_state(
                    self.model, k_sim, self.cfg.state_body_type, gh))
            else:
                parts.append(self._task_state(st, k_sim, key, gh))
        return jnp.concatenate(parts, axis=-1)

    def observe_body(self, st: EnvState, body_type: Optional[str] = None):
        k_sim = fk_mod.fk(self.model, st.sim)
        gh = self.ground_height_under(st.sim.root_p)
        return obs_mod.body_state(self.model, k_sim,
                                  body_type or self.cfg.state_body_type, gh)

    def observe_task(self, st: EnvState):
        k_sim = fk_mod.fk(self.model, st.sim)
        gh = self.ground_height_under(st.sim.root_p)
        parts = [self._task_state(st, k_sim, key, gh)
                 for key in self.task_keys]
        return jnp.concatenate(parts, axis=-1) if parts else jnp.zeros(0)

    def _task_state(self, st: EnvState, k_sim, key, ground_height=0.0):
        t = self.ref_time(st)
        if key.startswith("ref_motion"):
            kin_fks = []
            for dt in self.lookahead:
                tt = jnp.clip(t + dt, 0.0, self.ref_length(st.ref_idx))
                kin_fks.append(
                    self.kin_fk_at(st.ref_idx, tt)
                    if self._kin_fk_table is not None
                    else fk_mod.fk(self.model, self._kin_state(st.ref_idx,
                                                               tt)))
            return obs_mod.imitation_task_state(
                self.model, k_sim, kin_fks, self.cfg.state_body_type,
                include_abs="abs" in key, include_rel="rel" in key,
                include_facing_frame=not key.endswith("_noff"),
                ground_height=ground_height)
        if key == "phase_linear":
            return (t / self.ref_length(st.ref_idx))[..., None]
        if key == "phase_trigon":
            theta = 2 * jnp.pi * t
            return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
        raise NotImplementedError(key)

    # ------------------------------------------------------------------
    # actions
    # ------------------------------------------------------------------

    def action_to_targets(self, st: EnvState, action) -> step_mod.Action:
        """Split + denormalize the policy action into actuation targets
        (step pipeline, envs/env_humanoid_base.py:566-594; target-pose
        computation, :378-452).

        Layout: [residual linear force (3)] [residual angular force (3)]
        [torque | axis-angle target pose] per _build_action_spaces.
        """
        cfg = self.cfg
        c = 0
        root_force = root_torque = None
        if self._norm_lin is not None:
            f = self._norm_lin.norm_to_real(action[..., c:c + 3])
            c += 3
            frame = cfg.base_residual_linear_force_frame
            if frame == "base":
                R = quat.to_matrix(st.sim.root_q)
            elif frame == "facing":
                R, _ = tf.facing_frame(st.sim.root_q, st.sim.root_p,
                                       jnp.asarray(self.model.v_face),
                                       jnp.asarray(self.model.v_up_env))
            elif frame == "world":
                R = jnp.broadcast_to(jnp.eye(3), f.shape[:-1] + (3, 3))
            else:
                raise NotImplementedError(frame)
            root_force = jnp.einsum("...ij,...j->...i", R, f)
        if self._norm_ang is not None:
            t = self._norm_ang.norm_to_real(action[..., c:c + 3])
            c += 3
            # reference applies the torque in the root LINK frame
            # (applyExternalTorque LINK_FRAME, sim_agent.py:599-614)
            R = quat.to_matrix(st.sim.root_q)
            root_torque = jnp.einsum("...ij,...j->...i", R, t)

        rest = action[..., c:]
        J = self.model.num_joints
        if cfg.actuation == "tq":
            tq = self._norm_main.norm_to_real(rest)
            batch = rest.shape[:-1]
            torque = jnp.concatenate([jnp.zeros(batch + (6,)), tq], axis=-1)
            return step_mod.Action(
                target_q=quat.identity(batch + (J,)),
                target_w=jnp.zeros(batch + (J, 3)),
                root_force=root_force, root_torque=root_torque,
                torque=torque)

        a = self._norm_main.norm_to_real(rest)
        if cfg.action_type == "relative":
            t = self.ref_time(st)
            _, _, base_q = self.db.pose_at(st.ref_idx, t)
        else:
            base_q = jnp.asarray(self.base_q0)

        aa = jnp.zeros(a.shape[:-1] + (J, 3))
        cj = 0
        for j in range(J):
            if self.model.movable[j]:
                aa = aa.at[..., j, :].set(a[..., cj:cj + 3])
                cj += 3
        target = quat.mul(jnp.broadcast_to(base_q, aa.shape[:-1] + (4,)),
                          quat.from_axis_angle(aa))
        target = jnp.where(jnp.asarray(self.model.movable)[:, None], target,
                           jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1.0]),
                                            target.shape))
        return step_mod.Action(
            target_q=target, target_w=jnp.zeros_like(aa),
            root_force=root_force, root_torque=root_torque)

    # ------------------------------------------------------------------
    # obstacles
    # ------------------------------------------------------------------

    def throw_obstacle(self, pool, rng, target_pos):
        """Launch one obstacle at the character (throw_obstacle,
        envs/env_humanoid_base.py:363-366 + sim_obstacle.py:92-113)."""
        from ..physics import obstacles as obstacles_mod
        cfg = self.cfg
        shape = (obstacles_mod.SHAPE_BOX if cfg.obstacle_shape == "box"
                 else obstacles_mod.SHAPE_SPHERE)
        return obstacles_mod.throw(
            pool, rng, target_pos, v_up=jnp.asarray(self.model.v_up_env),
            shape=shape, vel=cfg.obstacle_vel, mass=cfg.obstacle_mass,
            ttl=cfg.obstacle_ttl)

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------

    def step(self, st: EnvState, action, timesteps_total=0.0):
        """One control step.  Returns (next_state, obs, reward, done, info).

        Pipeline parity: envs/env_humanoid_base.py:534-675.
        """
        st2, reward, done, info = self.step_core(st, action, timesteps_total)
        # a sim_div state is done and will be reset by the caller; keep its
        # terminal observation finite for any consumer in between
        obs = self.observe(st2)
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        return st2, obs, reward, done, info

    def step_core(self, st: EnvState, action, timesteps_total=0.0):
        """step without the observation build (autoreset composes it with a
        single observe over the merged state instead of two).

        timesteps_total: the trainer's global step count, consumed by reward
        weight schedules (set_learning_info plumbing,
        envs/env_humanoid_base.py:349-353 -> :973-976).
        """
        cfg = self.cfg
        act = self.action_to_targets(st, action)
        pool = st.obstacles
        rng = st.rng
        if pool is not None:
            rng, k1, k2 = jax.random.split(rng, 3)
            if cfg.obstacle_throw_interval > 0:
                # Poisson-ish random perturbation throws during training
                # (reference: external throw_obstacle triggers,
                # envs/env_humanoid_base.py:363-366)
                do = (jax.random.uniform(k1)
                      < self.dt_con / cfg.obstacle_throw_interval)
                thrown = self.throw_obstacle(pool, k2, st.sim.root_p)
                pool = jax.tree.map(lambda a, b: jnp.where(do, a, b),
                                    thrown, pool)
            if st.minv is not None:
                sim, minv2, pool = step_mod.control_step_carry(
                    self.model, st.sim, act, st.minv,
                    ground_height=self.ground, obstacles=pool)
            else:
                sim, pool = step_mod.control_step(self.model, st.sim, act,
                                                  ground_height=self.ground,
                                                  obstacles=pool)
                minv2 = None
        else:
            if st.minv is not None:
                sim, minv2, _ = step_mod.control_step_carry(
                    self.model, st.sim, act, st.minv,
                    ground_height=self.ground)
            else:
                sim = step_mod.control_step(self.model, st.sim, act,
                                            ground_height=self.ground)
                minv2 = None
        elapsed = st.elapsed + self.dt_con

        if minv2 is not None:
            # storage dtype must match the reset-seed table (autoreset
            # merges the two pytrees with jnp.where)
            minv2 = minv2.astype(st.minv.dtype)
        st1 = dataclasses.replace(st, sim=sim, elapsed=elapsed, rng=rng,
                                  obstacles=pool, minv=minv2)
        return self.post_physics(st, st1, timesteps_total)

    def post_physics(self, st: EnvState, st1: EnvState,
                     timesteps_total=0.0):
        """Everything after the physics step: kin-twin sync, task errors,
        reward tree, early termination.  Split out so multi-agent scenes
        (env/multi_agent.py) can run the COUPLED physics step and then
        vmap this per agent.  `st` is the pre-step state (reward queue /
        eoe carries), `st1` the post-physics state."""
        cfg = self.cfg
        sim = st1.sim
        elapsed = st1.elapsed
        t_ref = self.ref_time(st1)
        kin = self._kin_state(st1.ref_idx, t_ref)

        k_sim = fk_mod.fk(self.model, sim)
        k_kin = (self.kin_fk_at(st1.ref_idx, t_ref)
                 if self._kin_fk_table is not None
                 else fk_mod.fk(self.model, kin))

        error = self._task_error(sim, kin, k_sim, k_kin)
        reward, rew_info = self.reward_fn(error, timesteps_total)
        # a diverged sim must never leak NaN into returns/losses: its
        # reward is 0 and (below) it terminates immediately, skipping the
        # eoe grace window
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        # --- early termination (envs/env_humanoid_base.py:1003-1035 +
        #     envs/env_humanoid_imitation.py:369-395) ---
        rew_queue = jnp.roll(st.rew_queue, -1, axis=-1)
        rew_queue = rew_queue.at[..., -1].set(reward)
        rew_sum = st.rew_sum + reward

        eoe_flags = {}
        choices = cfg.early_term_choices
        if "ref_motion_end" in choices:
            eoe_flags["ref_motion_end"] = (
                t_ref >= self.ref_length(st1.ref_idx))
        if "low_reward" in choices:
            eoe_flags["low_reward"] = (
                jnp.mean(rew_queue, axis=-1) < cfg.et_low_reward_thres)
        gh_root = self.ground_height_under(sim.root_p)
        if "falldown" in choices:
            if cfg.falldown_method == "height":
                eoe_flags["falldown"] = \
                    (self._root_height(k_sim) - gh_root) < \
                    cfg.et_falldown_height_min
            else:
                dis, _ = step_mod.check_ground_contact(self.model, sim,
                                                       self.ground)
                eoe_flags["falldown"] = dis
        if "falldown_by_height" in choices:
            eoe_flags["falldown"] = \
                (self._root_height(k_sim) - gh_root) < \
                cfg.et_falldown_height_min
        if "sim_window" in choices:
            eoe_flags["sim_window"] = elapsed > cfg.et_sim_window_time
        if "sim_div" in choices or True:
            # divergence guard is always on: protects batched training
            finite = jnp.isfinite(sim.vel).all(axis=-1) & \
                jnp.isfinite(sim.root_p).all(axis=-1)
            eoe_flags["sim_div"] = ~finite | (
                jnp.abs(sim.vel).max(axis=-1) > 1e4)
        if "root_mismatch_orientation" in choices:
            dang = quat.geodesic_angle(sim.root_q, kin.root_q)
            eoe_flags["root_mismatch_orientation"] = (
                dang > cfg.et_root_mismatch_orientation_thres)
        if "root_mismatch_position" in choices:
            dp = jnp.linalg.norm(kin.root_p - sim.root_p, axis=-1)
            eoe_flags["root_mismatch_position"] = (
                dp > cfg.et_root_mismatch_position_thres)

        any_eoe = jnp.zeros_like(st.done)
        for v in eoe_flags.values():
            any_eoe = any_eoe | v

        eoe_intermediate = st.eoe_intermediate | any_eoe
        time_after_eoe = jnp.where(
            eoe_intermediate, st.time_after_eoe + self.dt_con, 0.0)
        done = eoe_intermediate & (time_after_eoe >= cfg.et_eoe_margin)
        # numerical divergence terminates NOW — the grace period would
        # keep stepping (and observing) a non-finite simulation
        done = done | eoe_flags["sim_div"]
        # rllib-style horizon cap (loco_imitation.yaml:43-44): hard
        # termination at `horizon` control steps, bypassing the eoe grace.
        if self.horizon is not None:
            done = done | (elapsed >= self.horizon * self.dt_con - 1e-6)

        st2 = EnvState(
            sim=sim, ref_idx=st1.ref_idx, start_time=st1.start_time,
            elapsed=elapsed, eoe_intermediate=eoe_intermediate,
            time_after_eoe=time_after_eoe, done=done,
            rew_queue=rew_queue, rew_sum=rew_sum, last_reward=reward,
            rng=st1.rng, obstacles=st1.obstacles, minv=st1.minv)

        info = {"rew_info": rew_info, "eoe": eoe_flags, "error": error,
                "episode_return": rew_sum,
                "episode_length": elapsed / self.dt_con}
        return st2, reward, done, info

    def step_auto(self, st: EnvState, action, timesteps_total=0.0):
        """step + autoreset: episodes that finished are replaced by fresh RSI
        resets (vmapped equivalent of rllib worker episode handling)."""
        st2, reward, done, info = self.step_core(st, action, timesteps_total)
        rng, sub = jax.random.split(st2.rng)
        st2 = dataclasses.replace(st2, rng=rng)
        fresh = self.reset(sub)
        new_st = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(done, done.shape + (1,) * (a.ndim - done.ndim)),
                a, b),
            fresh, st2)
        new_obs = self.observe(new_st)
        return new_st, new_obs, reward, done, info

    # ------------------------------------------------------------------
    # errors / rewards
    # ------------------------------------------------------------------

    def _root_height(self, k_fk):
        up = jnp.asarray(self.model.v_up_env)
        return jnp.einsum("...i,i->...", k_fk.body_p[..., 0, :], up)

    def _task_error(self, sim, kin, k_sim, k_kin):
        """Imitation task errors (envs/env_humanoid_imitation.py:280-367)."""
        md = self.model
        terms = self.reward_terms
        error = {}

        w = jnp.asarray(md.joint_weight[1:])         # per joint, normalized
        movable = jnp.asarray(md.movable)
        J = md.num_joints

        if "pose_pos" in terms:
            dq = quat.geodesic_angle(sim.joint_q, kin.joint_q)  # (...,J)
            e = jnp.where(movable, dq * dq, 0.0)
            error["pose_pos"] = jnp.sum(w * e, axis=-1) / J
        if "pose_vel" in terms:
            w_sim = state_mod.joint_omega(md, sim)
            w_kin = state_mod.joint_omega(md, kin)
            dv = jnp.sum((w_sim - w_kin) ** 2, axis=-1)
            e = jnp.where(movable, dv, 0.0)
            error["pose_vel"] = jnp.sum(w * e, axis=-1) / J

        v_face = jnp.asarray(md.v_face)
        v_up = jnp.asarray(md.v_up_env)
        R_sf, p_sf = tf.facing_frame(sim.root_q, sim.root_p, v_face, v_up)
        R_kf, p_kf = tf.facing_frame(kin.root_q, kin.root_p, v_face, v_up)
        RT_sf = jnp.swapaxes(R_sf, -1, -2)
        RT_kf = jnp.swapaxes(R_kf, -1, -2)

        if "ee" in terms:
            ee = jnp.asarray(md.end_effectors)
            se = k_sim.body_com[..., ee, :] - p_sf[..., None, :]
            ke = k_kin.body_com[..., ee, :] - p_kf[..., None, :]
            se = jnp.einsum("...ij,...kj->...ki", RT_sf, se)
            ke = jnp.einsum("...ij,...kj->...ki", RT_kf, ke)
            d = se - ke
            error["ee"] = jnp.mean(jnp.sum(d * d, axis=-1), axis=-1)
        if "root" in terms:
            dp = sim.root_p - kin.root_p
            dang = quat.geodesic_angle(sim.root_q, kin.root_q)
            dv = sim.root_v - kin.root_v
            dw = sim.root_w - kin.root_w
            error["root"] = (
                1.0 * jnp.sum(dp * dp, axis=-1)
                + 0.1 * dang * dang
                + 0.01 * jnp.sum(dv * dv, axis=-1)
                + 0.001 * jnp.sum(dw * dw, axis=-1))
        if "com" in terms:
            com_s, comv_s = fk_mod.com_and_vel(md, k_sim)
            com_k, comv_k = fk_mod.com_and_vel(md, k_kin)
            dcom = (jnp.einsum("...ij,...j->...i", RT_sf, com_s - p_sf)
                    - jnp.einsum("...ij,...j->...i", RT_kf, com_k - p_kf))
            dcomv = (jnp.einsum("...ij,...j->...i", RT_sf, comv_s)
                     - jnp.einsum("...ij,...j->...i", RT_kf, comv_k))
            error["com"] = (1.0 * jnp.sum(dcom * dcom, axis=-1)
                            + 0.1 * jnp.sum(dcomv * dcomv, axis=-1))
        return error


def make_env(spec_path: str, project_dir: Optional[str] = None,
             physics_overrides=None, kin_fk_table: bool = True):
    from .config import load_env_config_from_spec

    cfg = load_env_config_from_spec(spec_path, project_dir=project_dir)
    return ImitationEnv(cfg, physics_overrides=physics_overrides,
                        kin_fk_table=kin_fk_table)
