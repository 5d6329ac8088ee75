#!/usr/bin/env python
"""Stage-3/4 eval tables via the batched scanned evaluator.

Replaces the host-loop episode sweeps (driver --mode load printing one
episode at a time — one device dispatch per control step) with ONE
jitted scan-over-vmap program per eval mode (runtime/evaluator.py):
full, pass_through, and optional fixed-z lanes, >=10 episodes each,
EnvRunner semantics (envs/rllib_env_imitation.py:215-270).

Usage:
  python tools/eval_table.py --checkpoint CKPT [--episodes 10]
      [--max_steps 900] [--z_seeds 1,2,3,4] [--out FILE.json]
      [--label before]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

RUNTIME_SPEC = "/root/reference/data/spec/loco/loco_runtime_physics_vae.yaml"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--spec", default=RUNTIME_SPEC)
    ap.add_argument("--project_dir", default="/root/reference")
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument("--max_steps", type=int, default=900)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--z_seeds", default="",
                    help="comma-separated fixed-z probe seeds")
    ap.add_argument("--rsi", action="store_true",
                    help="random clip + uniform start per lane with the "
                         "spec's noise defaults — EnvRunner.reset parity "
                         "(the protocol behind the r4 mode_load numbers); "
                         "default: start_time=0, no noise")
    ap.add_argument("--label", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import types

    import yaml

    from physicsvae_tpu.driver import build_custom_policy
    from physicsvae_tpu.env import make_env
    from physicsvae_tpu.runtime.evaluator import BatchedEvaluator
    from physicsvae_tpu.train.checkpoint import load_model

    with open(args.spec) as f:
        spec = yaml.safe_load(f)
    env = make_env(args.spec, project_dir=args.project_dir)
    fake = types.SimpleNamespace(seed=args.seed, project_dir=args.project_dir,
                                 checkpoint=args.checkpoint,
                                 allow_missing_weights=True)
    _, _, bundle = build_custom_policy(fake, spec, env)
    assert bundle is not None, "spec does not declare custom_model: physics_vae"
    model, variables, _ = bundle
    variables = dict(variables)
    variables["params"] = load_model(args.checkpoint,
                                     like_params=variables["params"])

    ev = BatchedEvaluator(env, model, variables)
    rng = jax.random.PRNGKey(args.seed)
    report = {"checkpoint": os.path.abspath(args.checkpoint),
              "label": args.label, "episodes": args.episodes,
              "max_steps": args.max_steps, "seed": args.seed,
              "rsi": bool(args.rsi), "modes": {}}
    kw = dict(rsi=True, add_noise=None) if args.rsi else {}

    for method in ("full", "pass_through"):
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        out = ev.evaluate(k, args.episodes, args.max_steps, method, **kw)
        wall = time.perf_counter() - t0
        row = {k2: (v.tolist() if isinstance(v, np.ndarray) else v)
               for k2, v in out.items()}
        row["wall_s"] = wall
        report["modes"][method] = row
        print(f"{method:>12}: mean_step_rew {out['mean_step_reward']:.3f} "
              f"mean_len {out['mean_length']:.0f} "
              f"mean_return {out['mean_return']:.1f}  [{wall:.0f}s]")

    if args.z_seeds:
        dz = model.cfg.task_encoder_output_dim
        for zs in args.z_seeds.split(","):
            z = jax.random.normal(jax.random.PRNGKey(int(zs)), (dz,))
            rng, k = jax.random.split(rng)
            out = ev.evaluate(k, args.episodes, args.max_steps,
                              "pass_through", fixed_z=z, **kw)
            report["modes"][f"fixed_z_{zs}"] = {
                k2: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k2, v in out.items()}
            print(f"   fixed_z {zs}: mean_step_rew "
                  f"{out['mean_step_reward']:.3f} "
                  f"mean_len {out['mean_length']:.0f}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
