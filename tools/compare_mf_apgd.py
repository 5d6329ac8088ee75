#!/usr/bin/env python
"""Trajectory A/B for the matrix-free warm contact solve (use_mf_apgd).

Same methodology as tools/compare_hold_contacts.py: the MF path is
faithful if its divergence from the dense per-substep path grows at the
intrinsic chaos rate (measured by a 1e-6 velocity perturbation of the
dense path), not above it.

MEASURED (r4, B=64, 30 control steps): ratio 8.84 — EXCEEDS CHAOS.
Although the QP fixed point is untouched, at apgd_warm_iters=5 the solve
is approximate and the carried per-SLOT step sizes are misassigned when
the top-K contact selection reorders slots between substeps (a light
contact's large 1/L applied to a heavy contact's rows makes the 5
iterates overshoot).  Combined with the perf A/B (sim_only +9% but
env_step +0.1% at B=2048 — the env hot loop is not dominated by the
dense operator build), use_mf_apgd stays OPT-IN, default off.

Run on TPU (the MF kernel needs Mosaic): python tools/compare_mf_apgd.py
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
    args = ap.parse_args()

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

    def rollout(mf, vel_eps=0.0):
        params = model_mod.SimParams(use_mf_apgd=mf)
        model = model_mod.load_loco_model(params=params)
        rng.seed(0)
        st = build_state(model)
        if vel_eps:
            st = state_mod.SimState(st.root_p, st.root_q, st.joint_q,
                                    st.vel + vel_eps)
        act = step_mod.Action(
            target_q=jnp.broadcast_to(joint_q, (B,) + joint_q.shape),
            target_w=jnp.zeros((B, joint_q.shape[0], 3)))

        @jax.jit
        def run(st):
            def body(carry, _):
                st = carry
                st = jax.vmap(
                    lambda s, a: step_mod.control_step(model, s, a))(
                        st, act)
                return st, (st.root_p, st.vel)
            return jax.lax.scan(body, st, None, length=args.steps)

        t0 = time.perf_counter()
        _, (ps, vs) = run(st)
        jax.block_until_ready(ps)
        print(f"[use_mf_apgd={mf} eps={vel_eps}] "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        return np.asarray(ps), np.asarray(vs)

    p_h, v_h = rollout(True)
    p_x, v_x = rollout(False)
    p_e, v_e = rollout(False, vel_eps=1e-6)

    print(f"{'step':>4} {'mf |dp| max':>14} {'eps |dp| max':>13} "
          f"{'mf |dv| max':>14} {'eps |dv| max':>13}")
    for t in range(0, args.steps, max(1, args.steps // 10)):
        print(f"{t:>4} {np.abs(p_h[t] - p_x[t]).max():>14.6f} "
              f"{np.abs(p_e[t] - p_x[t]).max():>13.6f} "
              f"{np.abs(v_h[t] - v_x[t]).max():>14.6f} "
              f"{np.abs(v_e[t] - v_x[t]).max():>13.6f}")
    t_gate = args.steps - 1
    ratio = (np.abs(p_h[t_gate] - p_x[t_gate]).max()
             / max(np.abs(p_e[t_gate] - p_x[t_gate]).max(), 1e-12))
    print(f"GATE mf-divergence / chaos-divergence @ step {t_gate}: "
          f"{ratio:.2f} ({'OK <= ~3x' if ratio < 3.0 else 'EXCEEDS CHAOS'})")


if __name__ == "__main__":
    main()


# Reference hot loop this accelerates: envs/env_humanoid_tracking.py:393-399
# (Bullet re-forms and re-solves its contact rows every substep; the MF
# path keeps that freshness and only avoids materializing J M^-1 J^T).
