#!/usr/bin/env python
"""On-device trajectory A/B: opt-in Pallas kernels vs the XLA path.

Runs the SAME batched SPD-hold rollout (full contact stack, loco
humanoid) twice — once with {use_fused_dynamics, use_pallas_apgd} on,
once off — and reports per-control-step state divergence.  This is the
in-context numerical gate for enabling the kernels by default: the
per-substep difference is f32 reduction-order noise (~1e-3 relative,
tools/compare_dyn_kernel.py), so the trajectories must stay close over
a contact-rich horizon before we trust the kernels for training.

Run alone on the TPU:  python tools/compare_step_kernels.py [--batch 256]
"""
import argparse
import dataclasses
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30,
                    help="control steps (16 substeps each)")
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

    def rollout(use_kernels, vel_eps=0.0):
        params = model_mod.SimParams(use_fused_dynamics=use_kernels,
                                     use_pallas_apgd=use_kernels)
        model = model_mod.load_loco_model(params=params)
        rng.seed(0)
        st = build_state(model)
        if vel_eps:
            st = state_mod.SimState(st.root_p, st.root_q, st.joint_q,
                                    st.vel + vel_eps)
        hold = step_mod.Action(
            target_q=jnp.broadcast_to(joint_q, (B,) + joint_q.shape),
            target_w=jnp.zeros((B, joint_q.shape[0], 3)))

        @jax.jit
        def run(st):
            def body(carry, _):
                st = carry
                st = jax.vmap(
                    lambda s, a: step_mod.control_step(model, s, a))(
                        st, hold)
                return st, (st.root_p, st.vel)
            return jax.lax.scan(body, st, None, length=args.steps)

        t0 = time.perf_counter()
        _, (ps, vs) = run(st)
        jax.block_until_ready(ps)
        print(f"[{'kernels' if use_kernels else 'xla'}] "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        return np.asarray(ps), np.asarray(vs)

    p_k, v_k = rollout(True)
    p_x, v_x = rollout(False)
    # chaos control: the SAME solver with a 1e-6 velocity perturbation.
    # A contact-rich falling humanoid is Lyapunov-unstable, so bitwise
    # trajectory agreement is unattainable for ANY reordering; the kernel
    # path is faithful if its divergence growth matches the intrinsic
    # chaos rate rather than exceeding it.
    p_e, v_e = rollout(False, vel_eps=1e-6)

    print(f"{'step':>4} {'kern |dp| max':>14} {'eps |dp| max':>13} "
          f"{'kern |dv| max':>14} {'eps |dv| max':>13}")
    for t in range(0, args.steps, max(1, args.steps // 10)):
        dpk = np.abs(p_k[t] - p_x[t]).max()
        dpe = np.abs(p_e[t] - p_x[t]).max()
        dvk = np.abs(v_k[t] - v_x[t]).max()
        dve = np.abs(v_e[t] - v_x[t]).max()
        print(f"{t:>4} {dpk:>14.6f} {dpe:>13.6f} {dvk:>14.6f} "
              f"{dve:>13.6f}")
    t_gate = args.steps - 1
    ratio = (np.abs(p_k[t_gate] - p_x[t_gate]).max()
             / max(np.abs(p_e[t_gate] - p_x[t_gate]).max(), 1e-12))
    print(f"GATE kernel-divergence / chaos-divergence @ step {t_gate}: "
          f"{ratio:.2f} ({'OK <= ~3x' if ratio < 3.0 else 'EXCEEDS CHAOS'})")


if __name__ == "__main__":
    main()
