#!/usr/bin/env python
"""Trajectory A/B for the held-contact cadence (SimParams.hold_contacts).

Same methodology as tools/compare_hold_minv.py: the held-contact path is
faithful if its divergence from the per-substep-assembled path grows at the
intrinsic chaos rate of the contact-rich humanoid (measured by a 1e-6
velocity perturbation of the per-substep path), not above it.

Runs anywhere (CPU ok — no Pallas involved):
    python tools/compare_hold_contacts.py [--batch 64] [--steps 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--every", type=int, default=None,
                    help="hold_contacts_every override (operator rebuild "
                         "cadence in substeps; default = SimParams default)")
    ap.add_argument("--mode", type=str, default="hold_contacts",
                    choices=["hold_contacts", "hold_selection", "mf"],
                    help="which cadence/approximation to gate: held "
                         "operator, held SELECTION (+ matrix-free warm "
                         "solve on TPU), or pure matrix-free")
    ap.add_argument("--platform", type=str, default="default",
                    choices=["default", "cpu"],
                    help="cpu = safe to run while the TPU is busy")
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from physicsvae_tpu.kinematics import motion as motion_mod
    from physicsvae_tpu.kinematics.char_info import load_char_info
    from physicsvae_tpu.physics import model as model_mod
    from physicsvae_tpu.physics import state as state_mod
    from physicsvae_tpu.physics import step as step_mod

    char = load_char_info(
        "/root/reference/data/character/info/loco_char_info.py")
    m = motion_mod.from_bvh_file(
        "/root/reference/data/motion/loco/loco_hierarchy.bvh", char)
    root_p, root_q, joint_q = motion_mod.pose_at_time(m, 0.0)

    rng = np.random.RandomState(0)
    B = args.batch

    def build_state(model):
        st = state_mod.from_pose(
            model,
            jnp.asarray(np.tile(np.asarray(root_p), (B, 1))
                        + np.concatenate(
                            [rng.randn(B, 2) * 0.05,
                             np.zeros((B, 1))], axis=-1)),
            jnp.broadcast_to(root_q, (B, 4)),
            jnp.broadcast_to(joint_q, (B,) + joint_q.shape))
        return state_mod.SimState(
            st.root_p, st.root_q, st.joint_q,
            jnp.asarray(rng.randn(B, model.nv).astype(np.float32)) * 0.3)

    flag = {"hold_contacts": "hold_contacts",
            "hold_selection": "hold_selection",
            "mf": "use_mf_apgd"}[args.mode]
    every_key = {"hold_contacts": "hold_contacts_every",
                 "hold_selection": "hold_selection_every",
                 "mf": None}[args.mode]

    def rollout(hold, vel_eps=0.0):
        kw = {} if args.every is None or every_key is None else \
            {every_key: args.every}
        # hold_selection is default-ON since r5 and takes precedence in
        # control_step; the baseline and the non-hsel modes must disable
        # it explicitly to exercise the path under test.
        if flag != "hold_selection":
            kw["hold_selection"] = False
        params = model_mod.SimParams(**{flag: hold}, **kw)
        model = model_mod.load_loco_model(params=params)
        rng.seed(0)
        st = build_state(model)
        if vel_eps:
            st = state_mod.SimState(st.root_p, st.root_q, st.joint_q,
                                    st.vel + vel_eps)
        hold_act = step_mod.Action(
            target_q=jnp.broadcast_to(joint_q, (B,) + joint_q.shape),
            target_w=jnp.zeros((B, joint_q.shape[0], 3)))

        @jax.jit
        def run(st):
            def body(carry, _):
                st = carry
                st = jax.vmap(
                    lambda s, a: step_mod.control_step(model, s, a))(
                        st, hold_act)
                return st, (st.root_p, st.vel)
            return jax.lax.scan(body, st, None, length=args.steps)

        t0 = time.perf_counter()
        _, (ps, vs) = run(st)
        jax.block_until_ready(ps)
        print(f"[{flag}={hold} eps={vel_eps}] "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        return np.asarray(ps), np.asarray(vs)

    p_h, v_h = rollout(True)
    p_x, v_x = rollout(False)
    p_e, v_e = rollout(False, vel_eps=1e-6)

    print(f"{'step':>4} {'hold |dp| max':>14} {'eps |dp| max':>13} "
          f"{'hold |dv| max':>14} {'eps |dv| max':>13}")
    for t in range(0, args.steps, max(1, args.steps // 10)):
        print(f"{t:>4} {np.abs(p_h[t] - p_x[t]).max():>14.6f} "
              f"{np.abs(p_e[t] - p_x[t]).max():>13.6f} "
              f"{np.abs(v_h[t] - v_x[t]).max():>14.6f} "
              f"{np.abs(v_e[t] - v_x[t]).max():>13.6f}")
    t_gate = args.steps - 1
    ratio = (np.abs(p_h[t_gate] - p_x[t_gate]).max()
             / max(np.abs(p_e[t_gate] - p_x[t_gate]).max(), 1e-12))
    print(f"GATE hold-divergence / chaos-divergence @ step {t_gate}: "
          f"{ratio:.2f} ({'OK <= ~3x' if ratio < 3.0 else 'EXCEEDS CHAOS'})")


if __name__ == "__main__":
    main()


# Reference hot loop this accelerates: envs/env_humanoid_tracking.py:393-399
# (Bullet re-runs its narrow phase + builds fresh solver rows every substep;
# the held operator trades that for one assembly per control step, the same
# 1/fps_con staleness contract as the held mass inverse).
