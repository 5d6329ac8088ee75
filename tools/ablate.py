#!/usr/bin/env python
"""Throughput ablation matrix on the TPU (VERDICT r1 item 2: attack the perf
gap with data).  Reuses one env build (the motion-DB upload dominates setup)
and swaps SimParams per config via dataclasses.replace.

Measurements:
  sim_only   : control_step under lax.scan (physics only)
  env_step   : full step_auto (physics + kin twin + reward + EOE + obs)

Usage: python tools/ablate.py [--batch 2048] [--steps 8]
Run alone — never concurrently with another TPU process.
"""
import argparse
import copy
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_fn(fn, *args, reps=2):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--spec", type=str,
                    default="/root/reference/data/spec/loco/loco_imitation.yaml")
    ap.add_argument("--project-dir", type=str, default="/root/reference")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated config names to run")
    args = ap.parse_args()

    from physicsvae_tpu.env import make_env
    from physicsvae_tpu.physics import step as step_mod

    t0 = time.perf_counter()
    env0 = make_env(args.spec, project_dir=args.project_dir)
    log(f"[ablate] env built ({time.perf_counter()-t0:.0f}s)")

    CONFIGS = [
        ("baseline", {}, args.batch),
        ("B4096", {}, 4096),
        ("B8192", {}, 8192),
        ("no_selfcol", {"self_collision": False}, args.batch),
        ("K8", {"num_contacts": 8}, args.batch),
        ("apgd12", {"apgd_iters": 12}, args.batch),
        ("selfK4", {"num_self_contacts": 4}, args.batch),
        ("bf16", {"matmul_bf16": True}, args.batch),
        ("bf16_B4096", {"matmul_bf16": True}, 4096),
        ("bf16_apgd12_selfK4", {"matmul_bf16": True, "apgd_iters": 12,
                                "num_self_contacts": 4}, args.batch),
        # held inverse is now the default; refine_every1 is the A/B control
        ("refine_every1", {"ns_refine_every": 1}, args.batch),
        # round-3 kernels (now default-on; xla_path is the A/B control)
        ("xla_path", {"use_fused_dynamics": False,
                      "use_pallas_apgd": False}, args.batch),
        # r3b lean warm-substep kernel (lean outputs + in-kernel SPD);
        # full_warm_kernel is the A/B control (the pre-r3b default)
        ("full_warm_kernel", {"fuse_warm_kernel": False}, args.batch),
        # r4 in-kernel self-collision narrow phase (default-on);
        # xla_self_narrow is the A/B control (XLA narrow phase)
        ("xla_self_narrow", {"fuse_self_narrow": False}, args.batch),
        # r4 feature-major contact selection (default-on, bit-identical
        # selections); bm_selection is the A/B control
        ("bm_selection", {"fuse_selection": False}, args.batch),
        # r4 held contact operator (rebuild cadence in substeps); A/B vs
        # baseline, chaos gate: tools/compare_hold_contacts.py
        ("hold_e2", {"hold_contacts": True, "hold_contacts_every": 2},
         args.batch),
        ("hold_e4", {"hold_contacts": True, "hold_contacts_every": 4},
         args.batch),
        ("hold_e8", {"hold_contacts": True, "hold_contacts_every": 8},
         args.batch),
        # r4 matrix-free warm contact solve (fresh physics, no Delassus
        # materialization); fixed point identical to baseline
        ("mf_apgd", {"use_mf_apgd": True}, args.batch),
        ("pallas_apgd", {"use_pallas_apgd": True}, args.batch),
        ("pallas_fk", {"use_pallas_fk": True}, args.batch),
        ("fused_dyn", {"use_fused_dynamics": True}, args.batch),
        ("fused_dyn_apgd", {"use_fused_dynamics": True,
                            "use_pallas_apgd": True}, args.batch),
    ]
    if args.only:
        names = set(args.only.split(","))
        CONFIGS = [c for c in CONFIGS if c[0] in names]

    results = {}
    for name, overrides, B in CONFIGS:
        env = copy.copy(env0)
        env.model = dataclasses.replace(
            env0.model, params=dataclasses.replace(env0.model.params,
                                                   **overrides))
        rngs = jax.random.split(jax.random.PRNGKey(0), B)
        st = jax.jit(jax.vmap(env.reset))(rngs)
        jax.block_until_ready(st)

        T = args.steps

        @jax.jit
        def sim_only(sim):
            act = step_mod.hold_action(env.model)

            def body(s, _):
                return jax.vmap(lambda x: step_mod.control_step(
                    env.model, x, act))(s), None

            s, _ = jax.lax.scan(body, sim, None, length=T)
            return s

        @jax.jit
        def env_step(st):
            actions = jnp.zeros((T, B, env.dim_action))

            def body(s, a):
                s, obs, rew, done, _ = jax.vmap(
                    env.step_auto, in_axes=(0, 0, None))(s, a, 0.0)
                return s, rew

            s, rews = jax.lax.scan(body, st, actions)
            return s, rews

        t_sim = time_fn(sim_only, st.sim)
        t_env = time_fn(env_step, st)
        r = {
            "sim_only_steps_s": round(B * T / t_sim, 1),
            "env_step_steps_s": round(B * T / t_env, 1),
            "batch": B,
        }
        results[name] = r
        log(f"[ablate] {name}: {r}")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
