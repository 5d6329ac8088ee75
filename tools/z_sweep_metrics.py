#!/usr/bin/env python
"""Quantify latent-conditioned behavior diversity (stage-3 z-sweep).

Rolls the pass_through runtime (z held FIXED per rollout, motor decoder
only — envs/rllib_env_imitation.py:234-264) from the SAME initial state
for K prior samples, then reports per-z gait statistics and the pairwise
trajectory distances.  With an informative latent, different z must give
visibly different gaits (VERDICT r3 item 2); with a collapsed latent the
decoder ignores z and all rollouts coincide.

Distances are computed over the common prefix of each pair:
  - joint RMS: mean geodesic quaternion distance across the 18 spherical
    joints (rad);
  - root path dev: mean |Δ root position| (m).

Usage:  python tools/z_sweep_metrics.py --ckpt <orbax dir> [--seeds 1 2 3 4]
"""
import argparse
import itertools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNTIME_SPEC = "/root/reference/data/spec/loco/loco_runtime_physics_vae.yaml"


def quat_geodesic(q1, q2):
    """Angle between unit quaternions (xyzw), vectorized."""
    d = np.abs(np.sum(q1 * q2, axis=-1))
    return 2.0 * np.arccos(np.clip(d, -1.0, 1.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--env_seed", type=int, default=11)
    ap.add_argument("--max_steps", type=int, default=900)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from physicsvae_tpu import driver as drv
    from physicsvae_tpu.runtime.runner import EnvRunner
    from physicsvae_tpu.train.checkpoint import load_model

    dargs = drv.arg_parser().parse_args(
        ["--mode", "load", "--spec", RUNTIME_SPEC,
         "--project_dir", "/root/reference",
         "--checkpoint", os.path.abspath(args.ckpt),
         "--allow_missing_weights"])
    spec, env = drv.build(dargs)
    _, _, (model, variables, vcfg) = drv.build_custom_policy(dargs, spec,
                                                             env)
    variables = dict(variables)
    variables["params"] = load_model(os.path.abspath(args.ckpt),
                                     like_params=variables["params"])
    dim_z = model.cfg.task_encoder_output_dim

    trajs, stats = {}, {}
    for zs in args.seeds:
        runner = EnvRunner(env, model, variables,
                           rng=jax.random.PRNGKey(args.env_seed),
                           explore=False)
        runner.policy_eval_method = "pass_through"
        runner.fixed_z = jax.random.normal(jax.random.PRNGKey(zs), (dim_z,))
        runner.reset()
        rews, traj = runner.run_episode(max_steps=args.max_steps,
                                        record=True)
        root_p = np.stack([t[0] for t in traj])
        joint_q = np.stack([t[2] for t in traj])
        # trim trailing non-finite frames: an episode that ends on
        # sim_div records the diverged state at its final step
        finite = (np.isfinite(root_p).all(axis=(1,))
                  & np.isfinite(joint_q).all(axis=(1, 2)))
        n_ok = int(np.argmin(finite)) if not finite.all() else len(finite)
        root_p, joint_q = root_p[:n_ok], joint_q[:n_ok]
        dt = 1.0 / float(env.cfg.fps_con)
        vel = np.diff(root_p, axis=0) / dt if len(root_p) > 1 else \
            np.zeros((1, 3))
        trajs[zs] = (root_p, joint_q)
        stats[zs] = {
            "len": len(rews), "mean_rew": float(np.mean(rews)),
            "mean_speed_mps": float(np.linalg.norm(vel, axis=-1).mean()),
            "net_displacement_m": float(
                np.linalg.norm(root_p[-1] - root_p[0])),
        }
        print(f"z seed {zs}: {json.dumps(stats[zs])}")

    pairs = {}
    for a, b in itertools.combinations(args.seeds, 2):
        (pa, qa), (pb, qb) = trajs[a], trajs[b]
        n = min(len(pa), len(pb))
        jd = quat_geodesic(qa[:n], qb[:n]).mean()
        rd = np.linalg.norm(pa[:n] - pb[:n], axis=-1).mean()
        pairs[f"{a}-{b}"] = {"common_steps": int(n),
                             "joint_rms_rad": float(jd),
                             "root_dev_m": float(rd)}
        print(f"z{a} vs z{b}: joint RMS {jd:.3f} rad, "
              f"root dev {rd:.3f} m over {n} steps")

    report = {"ckpt": os.path.abspath(args.ckpt), "env_seed": args.env_seed,
              "per_z": stats, "pairwise": pairs}
    # distinctness verdict: every pair must differ by more than numerical
    # noise in joint space (a collapsed decoder gives ~0 everywhere)
    min_jd = min(p["joint_rms_rad"] for p in pairs.values())
    report["min_pairwise_joint_rms_rad"] = float(min_jd)
    report["distinct"] = bool(min_jd > 0.05)
    print(f"min pairwise joint RMS: {min_jd:.3f} rad -> "
          f"{'DISTINCT' if report['distinct'] else 'NOT distinct'}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("report:", args.out)
    return 0 if report["distinct"] else 1


if __name__ == "__main__":
    sys.exit(main())
