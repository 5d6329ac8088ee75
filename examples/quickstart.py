"""Quickstart: the full PhysicsVAE pipeline in ~40 lines.

Runs a tiny version of every stage against the reference's loco assets:
  1. batched imitation env rollout (the physics engine at work)
  2. a few PPO iterations
  3. expert-demo generation with the PPO policy
  4. two-phase cVAE training on the demos

Usage:  python examples/quickstart.py  [--project_dir /root/reference]
"""
import argparse
import tempfile

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--project_dir", default="/root/reference")
    ap.add_argument("--num_envs", type=int, default=64)
    args = ap.parse_args()

    from physicsvae_tpu.env import make_env
    from physicsvae_tpu.train.ppo import PPOConfig, PPOTrainer
    from physicsvae_tpu.train.demo_gen import DemoGenConfig, generate_demos, \
        policy_from_params
    from physicsvae_tpu.train.dataset import Batches, load_physics_vae_dataset
    from physicsvae_tpu.models.physics_vae import PhysicsVAEConfig
    from physicsvae_tpu.train.vae import VAETrainConfig, VAETrainer

    spec = f"{args.project_dir}/data/spec/loco/loco_test.yaml"
    env = make_env(spec, project_dir=args.project_dir)
    print(f"env: state={env.dim_state} body={env.dim_state_body} "
          f"task={env.dim_state_task} action={env.dim_action}")

    # 1+2. PPO for a few iterations
    cfg = PPOConfig(num_envs=args.num_envs, rollout_length=32,
                    num_sgd_iter=4, sgd_minibatch_size=256)
    tr = PPOTrainer(env, cfg, jax.random.PRNGKey(0))
    tr.train(3, log_fn=lambda m: print(
        f"iter {m['iter']}: reward={m['episode_reward_mean']:.3f} "
        f"({m['steps_per_sec']:.0f} steps/s)"))

    # 3. demo generation
    with tempfile.TemporaryDirectory() as tmp:
        demos = f"{tmp}/demos.pkl"
        generate_demos(env, policy_from_params(tr), jax.random.PRNGKey(1),
                       DemoGenConfig(iter_per_episode=2, max_retries=1),
                       output_path=demos)

        # 4. cVAE (tiny)
        X, Y, data = load_physics_vae_dataset([demos])
        mcfg = PhysicsVAEConfig(
            dim_state_body=data["dim_state_body"],
            dim_state_task=data["dim_state_body"],
            dim_action=data["dim_action"])
        vt = VAETrainer(mcfg, VAETrainConfig(max_iter=4,
                                             max_iter_world_model=2),
                        jax.random.PRNGKey(2))
        batches = Batches(X, Y, 256)
        for _ in range(4):
            m = vt.train_epoch(batches)
            print(f"vae iter {m['iter']} ({m['phase']}): loss={m['loss']:.4f}")

    print("quickstart complete")


if __name__ == "__main__":
    main()
