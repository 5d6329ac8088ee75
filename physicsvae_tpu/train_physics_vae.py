"""cVAE trainer CLI — drop-in for the reference train_physics_vae.py.

Same argparse surface (train_physics_vae.py:30-55) and schedule:

  python -m physicsvae_tpu.train_physics_vae \
      --data_train demos.pkl --max_iter_world_model 300 --max_iter 800 \
      --latent_dim 32 --local_dir ./runs --name vae1

Hyperparameter sweeps (tune.grid_search in the reference) run over the
cartesian product of the repeated flags — sequentially by default, or
CONCURRENTLY on one chip with --parallel_trials (vmapped trials; the
TPU-native equivalent of tune's parallel trial scheduling).
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
    p.add_argument("--test_frac", type=float, default=0.0,
                   help="random holdout fraction of the training tuples, "
                        "evaluated each epoch as test_* metrics (used "
                        "when no --data_test files are given)")
    p.add_argument("--parallel_trials", action="store_true",
                   help="run the (kl, cyc) grid CONCURRENTLY as vmapped "
                        "trials per prior type (tune.grid_search trial "
                        "parallelism; needs a pretrained --world_model "
                        "or max_iter_world_model, which trains once and "
                        "is shared)")
    p.add_argument("--use_a_gt", action="store_true",
                   help="train on the noise-free expert actions "
                        "(action_gt; reference "
                        "load_dataset_for_PhysicsVAE use_a_gt)")
    return p


def main(argv=None):
    from .train.checkpoint import load_component, save_model
    from .train.dataset import Batches, load_physics_vae_dataset
    from .train.vae import VAETrainer

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

    # Held-out split (reference TrainModel evaluates a test loader each
    # epoch, torch_models.py:146-161): explicit --data_test files, or a
    # random --test_frac holdout carved from the training tuples.
    Xt = Yt = None
    if args.data_test:
        Xt, Yt, _ = load_physics_vae_dataset(
            args.data_test, lookahead=args.lookahead, use_a_gt=args.use_a_gt)
    elif args.test_frac > 0.0:
        n_test = min(int(X.shape[0] * args.test_frac), 65536)
        perm = np.random.default_rng(12345).permutation(X.shape[0])
        Xt, Yt = X[perm[:n_test]], Y[perm[:n_test]]
        X, Y = X[perm[n_test:]], Y[perm[n_test:]]
        print(f"holdout: {n_test} tuples ({args.test_frac:.0%})")

    if args.parallel_trials:
        return _run_parallel(args, X, Y, Xt, Yt, dim_sb, dim_a,
                             kl_grid, cyc_grid, prior_grid)

    best = None
    for kl, cyc, prior in itertools.product(kl_grid, cyc_grid, prior_grid):
        trial = f"{args.name}_kl={kl}_cyc={cyc}_prior={prior}"
        trial_dir = os.path.join(args.local_dir, trial)
        os.makedirs(trial_dir, exist_ok=True)

        mcfg, tcfg = _mcfg_tcfg(args, dim_sb, dim_a, prior, kl=kl, cyc=cyc)
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
        Xtd = jnp.asarray(Xt) if Xt is not None else None
        Ytd = jnp.asarray(Yt) if Yt is not None else None
        log_path = os.path.join(trial_dir, "progress.jsonl")
        final = None
        for it in range(args.max_iter):
            m = tr.train_epoch_device(Xd, Yd, np_rng)
            if Xtd is not None:
                m.update(tr.eval_metrics(Xtd, Ytd))
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


def _mcfg_tcfg(args, dim_sb, dim_a, prior, kl=1.0, cyc=1e-3):
    from .models.fc import default_fc_layers
    from .models.physics_vae import PhysicsVAEConfig
    from .train.vae import VAETrainConfig

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
    return mcfg, tcfg


def _run_parallel(args, X, Y, Xt, Yt, dim_sb, dim_a,
                  kl_grid, cyc_grid, prior_grid):
    """Concurrent (kl, cyc) trials per prior type (ParallelCVAETrials)."""
    import dataclasses

    from .train.checkpoint import load_component, save_model
    from .train.vae import ParallelCVAETrials, VAETrainer, make_loss_fn

    combos = list(itertools.product(kl_grid, cyc_grid))
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    Xtd = jnp.asarray(Xt) if Xt is not None else None
    Ytd = jnp.asarray(Yt) if Yt is not None else None

    for prior in prior_grid:
        mcfg, tcfg = _mcfg_tcfg(args, dim_sb, dim_a, prior)
        # -- shared init (+ world model: loaded, or pretrained ONCE) ------
        seq = VAETrainer(mcfg, tcfg, jax.random.PRNGKey(0))
        n_cvae = args.max_iter
        if args.world_model:
            init_params = load_component(args.world_model, seq.params,
                                         "world_model")
            print("loaded world model from", args.world_model)
        elif args.max_iter_world_model > 0:
            np_rng = np.random.default_rng(0)
            for _ in range(args.max_iter_world_model):
                m = seq.train_epoch_device(Xd, Yd, np_rng)
                if m["iter"] % 10 == 0 or m["iter"] == 1:
                    print("shared world model", json.dumps(m))
            init_params = seq.params
            n_cvae = args.max_iter - args.max_iter_world_model
        else:
            init_params = seq.params

        cvae_cfg = dataclasses.replace(tcfg, max_iter_world_model=0)
        tr = ParallelCVAETrials(mcfg, cvae_cfg, combos,
                                jax.random.PRNGKey(0),
                                init_params=init_params)

        trial_dirs = []
        for kl, cyc in combos:
            d = os.path.join(args.local_dir,
                             f"{args.name}_kl={kl}_cyc={cyc}_prior={prior}")
            os.makedirs(d, exist_ok=True)
            trial_dirs.append(d)

        eval_jit = None
        if Xtd is not None:
            loss_fn = make_loss_fn(tr.model, cvae_cfg)

            def _ev(params, kl_c, cyc_c):
                coeffs = {"kl": kl_c, "a_rec": tcfg.a_rec_coeff,
                          "s_rec": 0.0, "cyc": cyc_c}
                _, m = loss_fn(params, tr.constants, Xtd, Ytd,
                               jax.random.PRNGKey(1234), coeffs, 1.0)
                return m

            eval_jit = jax.jit(jax.vmap(_ev))

        np_rng = np.random.default_rng(0)
        for it in range(n_cvae):
            ms = tr.train_epoch_device(Xd, Yd, np_rng)
            if eval_jit is not None:
                tm = eval_jit(tr.params, tr.kl_arr, tr.cyc_arr)
                for t, m in enumerate(ms):
                    m.update({f"test_{k}": float(v[t])
                              for k, v in tm.items()})
            for t, m in enumerate(ms):
                with open(os.path.join(trial_dirs[t], "progress.jsonl"),
                          "a") as f:
                    f.write(json.dumps(m) + "\n")
            if (it + 1) % 10 == 0 or it == 0:
                print(f"[parallel x{len(combos)}] " + json.dumps(ms[0]))

        for t, d in enumerate(trial_dirs):
            save_model(os.path.join(d, "ckpt_final"), tr.trial_params(t))
            print("saved", os.path.join(d, "ckpt_final"))


if __name__ == "__main__":
    main()
