"""cVAE trainer CLI — drop-in for the reference train_physics_vae.py.

Same argparse surface (train_physics_vae.py:30-55) and schedule:

  python -m physicsvae_tpu.train_physics_vae \
      --data_train demos.pkl --max_iter_world_model 300 --max_iter 800 \
      --latent_dim 32 --local_dir ./runs --name vae1

Hyperparameter sweeps (tune.grid_search in the reference) run as sequential
trials over the cartesian product of the repeated flags.
"""
from __future__ import annotations

import argparse
import itertools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def arg_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--max_iter_world_model", type=int, default=0)
    p.add_argument("--max_iter", type=int, default=100)
    p.add_argument("--data_train", action="append", required=True, type=str)
    p.add_argument("--data_test", action="append", type=str, default=None)
    p.add_argument("--num_data", type=int, default=None)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--lr", type=float, default=0.0005)
    p.add_argument("--lr_schedule", type=str, default="step")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--checkpoint_freq", type=int, default=100)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--name", type=str, default="physics_vae")
    p.add_argument("--local_dir", type=str, default="./runs")
    p.add_argument("--world_model", type=str, default=None,
                   help="checkpoint dir to preload the world model from")
    p.add_argument("--latent_dim", type=int, default=32)
    p.add_argument("--lookahead", type=int, default=1)
    p.add_argument("--vae_kl_coeff", type=float, action="append", default=None)
    p.add_argument("--vae_cycle_coeff", type=float, action="append",
                   default=None)
    p.add_argument("--latent_prior_type", type=str, action="append",
                   default=None)
    # model widths (tune.grid_search defaults, train_physics_vae.py:269-279)
    p.add_argument("--MD_width", type=int, default=512)
    p.add_argument("--MD_depth", type=int, default=3)
    p.add_argument("--TE_width", type=int, default=256)
    p.add_argument("--TE_depth", type=int, default=2)
    p.add_argument("--world_model_width", type=int, default=1024)
    p.add_argument("--world_model_depth", type=int, default=2)
    # DatasetBase normalize_x/normalize_y (torch_models.py:39-95); the
    # reference passes normalize=False for PhysicsVAE
    # (train_physics_vae.py:164), so both default off.
    p.add_argument("--normalize_x", action="store_true")
    p.add_argument("--normalize_y", action="store_true")
    # anti-collapse opt-ins (train/vae.py VAETrainConfig)
    p.add_argument("--vae_kl_anneal_iters", type=int, default=0,
                   help="ramp the KL coefficient over the first N cVAE "
                        "epochs (beta-annealing; 0 = reference loss)")
    p.add_argument("--vae_free_bits", type=float, default=0.0,
                   help="per-latent-dim KL floor in nats (0 = off)")
    p.add_argument("--use_a_gt", action="store_true",
                   help="train on the noise-free expert actions "
                        "(action_gt; reference "
                        "load_dataset_for_PhysicsVAE use_a_gt)")
    return p


def main(argv=None):
    from .models.fc import default_fc_layers
    from .models.physics_vae import PhysicsVAEConfig
    from .train.checkpoint import load_component, save_model
    from .train.dataset import Batches, load_physics_vae_dataset
    from .train.vae import VAETrainConfig, VAETrainer

    args = arg_parser().parse_args(argv)

    kl_grid = args.vae_kl_coeff or [1.0]
    cyc_grid = args.vae_cycle_coeff or [1e-3]
    prior_grid = args.latent_prior_type or ["normal_zero_mean_one_std"]

    X, Y, data = load_physics_vae_dataset(
        args.data_train, num_samples=args.num_data, lookahead=args.lookahead,
        use_a_gt=args.use_a_gt)
    dim_sb = data["dim_state_body"]
    dim_a = data["dim_action"]
    print(f"dataset: {X.shape[0]} tuples, dim_state_body={dim_sb}, "
          f"dim_action={dim_a}")

    best = None
    for kl, cyc, prior in itertools.product(kl_grid, cyc_grid, prior_grid):
        trial = f"{args.name}_kl={kl}_cyc={cyc}_prior={prior}"
        trial_dir = os.path.join(args.local_dir, trial)
        os.makedirs(trial_dir, exist_ok=True)

        mcfg = PhysicsVAEConfig(
            dim_state_body=dim_sb, dim_state_task=dim_sb, dim_action=dim_a,
            latent_prior_type=(False if prior in ("False", "false") else prior),
            task_encoder_output_dim=args.latent_dim,
            task_encoder_layers=tuple(
                default_fc_layers(args.TE_width, args.TE_depth)),
            motor_decoder_layers=tuple(
                default_fc_layers(args.MD_width, args.MD_depth)),
            world_model_layers=tuple(
                default_fc_layers(args.world_model_width,
                                  args.world_model_depth)),
        )
        tcfg = VAETrainConfig(
            lr=args.lr, lr_schedule=args.lr_schedule,
            batch_size=args.batch_size, max_iter=args.max_iter,
            max_iter_world_model=args.max_iter_world_model,
            lookahead=args.lookahead, vae_kl_coeff=kl, vae_cycle_coeff=cyc,
            kl_anneal_iters=args.vae_kl_anneal_iters,
            kl_free_bits=args.vae_free_bits)
        tr = VAETrainer(mcfg, tcfg, jax.random.PRNGKey(0))
        if args.world_model:
            tr.params = load_component(args.world_model, tr.params,
                                       "world_model")
            print("loaded world model from", args.world_model)

        batches = Batches(X, Y, tcfg.batch_size,
                          normalize_x=args.normalize_x,
                          normalize_y=args.normalize_y)
        # dataset uploaded once; each epoch is a single scanned device
        # program (per-minibatch host->device transfer is the bottleneck
        # on a tunneled chip)
        Xd = jnp.asarray(batches.X)
        Yd = jnp.asarray(batches.Y)
        np_rng = np.random.default_rng(0)
        log_path = os.path.join(trial_dir, "progress.jsonl")
        final = None
        for it in range(args.max_iter):
            m = tr.train_epoch_device(Xd, Yd, np_rng)
            final = m
            with open(log_path, "a") as f:
                f.write(json.dumps(m) + "\n")
            if (it + 1) % 10 == 0 or it == 0:
                print(trial, json.dumps(m))
            if (it + 1) % args.checkpoint_freq == 0:
                save_model(os.path.join(trial_dir, f"ckpt_{it+1:06d}"),
                           tr.params)
        save_model(os.path.join(trial_dir, "ckpt_final"), tr.params)
        if best is None or final["loss"] < best[0]:
            best = (final["loss"], trial_dir, tr)

    print("best trial:", best[1])
    if args.output:
        save_model(args.output, best[2].params)
        print("Model Saved:", args.output)


if __name__ == "__main__":
    main()
