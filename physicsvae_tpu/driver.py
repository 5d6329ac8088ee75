"""Main CLI driver: train / load / gen_expert_demo with reference specs.

Re-build of rllib_driver.py (argparse surface at rllib_driver.py:32-75):

  python -m physicsvae_tpu.driver --mode train --spec data/spec/loco/
      loco_imitation.yaml --project_dir /root/reference

Modes (rllib_driver.py:221-298):
  train            on-device PPO (replaces tune.run(PPO|DDPPO))
  load             restore a checkpoint and roll episodes (headless; exports
                   a BVH trajectory instead of the GL viewer)
  gen_expert_demo  vmapped dataset factory
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def arg_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", required=True,
                   choices=["train", "load", "gen_expert_demo"])
    p.add_argument("--spec", required=True, type=str)
    p.add_argument("--project_dir", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--local_dir", type=str, default="./data/learning")
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--num_iter", type=int, default=100)
    p.add_argument("--rollout_length", type=int, default=None,
                   help="steps per env per PPO iteration; default derives "
                        "train_batch_size/num_envs from the spec "
                        "(rllib_driver.py:198-216 parity), falling back "
                        "to 128")
    p.add_argument("--checkpoint_freq", type=int, default=50)
    p.add_argument("--demo_window", type=float, default=1000.0,
                   help="gen_expert_demo sliding-window size in seconds "
                        "(reference window_size, rllib_env_imitation.py:53). "
                        "With reference falldown semantics a window only "
                        "counts if the expert survives ALL of it, so size "
                        "it to the expert's survival horizon")
    p.add_argument("--demo_stride", type=float, default=1000.0)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--num_episodes", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="auto-resume from <local_dir>/trainer_state if "
                        "present (tune resume=ERRORED_ONLY parity)")
    p.add_argument("--allow_missing_weights", action="store_true",
                   help="continue with fresh init when a spec-declared "
                        "load_weights path is missing (default: raise)")
    p.add_argument("--eval_method", type=str, default="full",
                   choices=["full", "pass_through"],
                   help="physics_vae runtime eval mode "
                        "(EnvRunner, envs/rllib_env_imitation.py:215-270)")
    p.add_argument("--fixed_z_seed", type=int, default=None,
                   help="pass_through z-sweep: hold ONE prior sample "
                        "(drawn with this seed) fixed for all steps")
    # Multi-host bootstrap (replaces the reference's Ray head/client
    # ip_head env-var bootstrap, rllib_driver.py:87-117); also settable
    # via PVAE_COORDINATOR / PVAE_NUM_PROCESSES / PVAE_PROCESS_ID.
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 (multi-host DCN training)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu"],
                   help="force a jax backend (the JAX_PLATFORMS env var "
                        "is ignored when a TPU plugin is installed; this "
                        "sets jax_platforms in-process before first use)")
    return p


def build(args):
    from .env import make_env
    from .env.config import load_spec

    spec = load_spec(args.spec)
    env = make_env(args.spec, project_dir=args.project_dir)
    return spec, env


def build_vae_cfg_from_spec(spec: dict, env):
    """PhysicsVAEConfig from spec.config.model.custom_model_config (the
    reference custom-model plumbing, rllib_driver.py:143-149 +
    rllib_model_torch.py:462-510)."""
    from .models.physics_vae import PhysicsVAEConfig

    cmc = spec.get("config", {}).get("model", {}).get(
        "custom_model_config", {})
    kw = dict(dim_state_body=env.dim_state_body,
              dim_state_task=env.dim_state_task,
              dim_action=env.dim_action)
    for key in ("log_std_type", "sample_std", "task_encoder_output_dim",
                "latent_prior_type", "motor_decoder_helper_enable",
                "motor_decoder_helper_range"):
        if key in cmc:
            kw[key] = cmc[key]
    for key in ("task_encoder_inputs", "motor_decoder_inputs"):
        if key in cmc:
            kw[key] = tuple(cmc[key])
    for key in ("task_encoder_layers", "motor_decoder_layers",
                "motor_decoder_helper_layers", "value_fn_layers",
                "world_model_layers", "latent_prior_layers"):
        if cmc.get(key):
            kw[key] = tuple(cmc[key])
    return PhysicsVAEConfig(**kw)


def build_custom_policy(args, spec: dict, env):
    """Resolve spec.config.model.custom_model into a PPO policy factory with
    per-component preload + freeze (rllib_model_torch.py:707-727, :930-950).

    Returns (policy_factory | None, param_label_fn | None, vae_bundle | None)
    — all None selects the default fcnn policy.
    """
    model_cfg = spec.get("config", {}).get("model", {})
    custom = model_cfg.get("custom_model", "fcnn")
    if custom in (None, "fcnn"):
        return None, None, None
    if custom == "lstm":
        # recurrent policy (reference LSTM zoo, rllib_model_torch.py:48-158)
        from .train.ppo import lstm_policy_factory
        return lstm_policy_factory, None, None
    if custom != "physics_vae":
        raise NotImplementedError(custom)

    from .models.physics_vae import component_label, init_model
    from .train.checkpoint import load_component, load_model
    from .train.ppo import make_physics_vae_policy

    cmc = model_cfg.get("custom_model_config", {})
    vcfg = build_vae_cfg_from_spec(spec, env)
    model, variables = init_model(vcfg, jax.random.PRNGKey(args.seed))
    params = variables["params"]

    pd = args.project_dir or spec.get("config", {}).get(
        "env_config", {}).get("project_dir", ".")

    def full(p):
        return p if os.path.isabs(p) else os.path.join(pd, p)

    def try_load(path, fn, what):
        if os.path.exists(full(path)):
            return fn(full(path))
        # A typo'd spec path must not silently train/eval with random
        # weights (matches the reference's torch.load FileNotFoundError,
        # rllib_model_torch.py:707-727).  Opt out per-spec or via the
        # explicit CLI flag.
        if cmc.get("allow_missing_weights") or getattr(
                args, "allow_missing_weights", False):
            print(f"WARNING: {what} weights not found at {full(path)}; "
                  "continuing with fresh init (allow_missing_weights)")
            return None
        raise FileNotFoundError(
            f"{what} weights not found at {full(path)} (spec-declared "
            "load path; set custom_model_config.allow_missing_weights "
            "to continue with fresh init)")

    # An explicit --checkpoint supersedes the spec's preload paths (the
    # runtime spec ships pointing at the reference's missing pretrained
    # blob; the caller's checkpoint is the real weights source).
    skip_preload = bool(getattr(args, "checkpoint", None))
    if skip_preload and (cmc.get("load_weights")
                         or any(cmc.get(c + "_load_weights")
                                for c in ("task_encoder", "motor_decoder",
                                          "motor_decoder_helper",
                                          "world_model"))):
        print("NOTE: --checkpoint given; ignoring spec load_weights paths")
    if cmc.get("load_weights") and not skip_preload:
        loaded = try_load(cmc["load_weights"],
                          lambda p: load_model(p, like_params=params),
                          "model")
        params = loaded if loaded is not None else params
    frozen = set()
    for comp in ("task_encoder", "motor_decoder", "motor_decoder_helper",
                 "world_model"):
        w = cmc.get(comp + "_load_weights")
        if w and not skip_preload:
            loaded = try_load(w, lambda p: load_component(p, params, comp),
                              comp)
            params = loaded if loaded is not None else params
        if cmc.get(comp + "_learnable") is False:
            frozen.add(comp)

    variables = dict(variables)
    variables["params"] = params
    factory = make_physics_vae_policy(vcfg, variables=variables)

    label_fn = None
    if frozen:
        import jax as _jax

        def label_fn(params):
            return _jax.tree_util.tree_map_with_path(
                lambda p, _: "frozen" if component_label(p) in frozen
                else "train", params)

    return factory, label_fn, (model, variables, vcfg)


def derive_rollout_length(cfg_d, num_envs, explicit=None):
    """Spec-driven batch geometry (reference adjust_config,
    rllib_driver.py:198-216): rollout_length = train_batch_size /
    num_envs, so e.g. loco_imitation.yaml's train_batch_size: 100000
    runs 100k-step iterations without CLI overrides.  An explicit
    --rollout_length wins; without either, 128.  DDPPO specs carry
    train_batch_size: -1 (learning happens in-worker,
    rllib_driver.py:213-214) — also the fallback."""
    if explicit is not None:
        return int(explicit)
    tbs = cfg_d.get("train_batch_size")
    if tbs and int(tbs) > 0:
        return max(int(tbs) // int(num_envs), 1)
    return 128


def mode_train(args):
    from .train.ppo import PPOConfig, PPOTrainer
    from .train.checkpoint import save_model

    spec, env = build(args)
    cfg_d = spec.get("config", {})
    mcfg = cfg_d.get("model", {}).get("custom_model_config", {})
    rollout_length = derive_rollout_length(cfg_d, args.num_envs,
                                           args.rollout_length)
    cfg = PPOConfig(
        gamma=cfg_d.get("gamma", 0.98),
        lam=cfg_d.get("lambda", 0.95),
        clip_param=cfg_d.get("clip_param", 0.2),
        vf_clip_param=cfg_d.get("vf_clip_param", 1000),
        num_sgd_iter=cfg_d.get("num_sgd_iter", 20),
        lr=cfg_d.get("lr", 2e-5),
        sgd_minibatch_size=cfg_d.get("sgd_minibatch_size", 500),
        horizon=cfg_d.get("horizon", 900),
        num_envs=args.num_envs,
        rollout_length=rollout_length,
        sample_std=mcfg.get("sample_std", 0.1),
        log_std_type=mcfg.get("log_std_type", "constant"),
        kl_coeff=cfg_d.get("kl_coeff", 0.0),
        kl_target=cfg_d.get("kl_target", 0.01),
        grad_clip=cfg_d.get("grad_clip"),
    )
    factory, label_fn, _ = build_custom_policy(args, spec, env)
    tr = PPOTrainer(env, cfg, jax.random.PRNGKey(args.seed),
                    policy_factory=factory, param_label_fn=label_fn)
    os.makedirs(args.local_dir, exist_ok=True)
    state_dir = os.path.join(args.local_dir, "trainer_state")
    if args.resume and os.path.isdir(state_dir):
        tr.restore_state(state_dir)
        print(f"resumed from {state_dir} at {tr.timesteps_total} steps")
    log_path = os.path.join(args.local_dir, "progress.jsonl")

    def log(m):
        print(json.dumps(m))
        with open(log_path, "a") as f:
            f.write(json.dumps(m) + "\n")
        it = m["iter"]
        if (it + 1) % args.checkpoint_freq == 0:
            save_model(os.path.join(args.local_dir, f"ckpt_{it+1:06d}"),
                       tr.params)
            tr.save_state(state_dir)

    tr.train(args.num_iter, log_fn=log)
    save_model(os.path.join(args.local_dir, "ckpt_final"), tr.params)
    print("saved:", os.path.join(args.local_dir, "ckpt_final"))


def _load_policy(args, env):
    from .models.policy import PolicyConfig, FullyConnectedPolicy
    from .train.checkpoint import load_model
    import jax.numpy as jnp

    pcfg = PolicyConfig(dim_state=env.dim_state, dim_action=env.dim_action,
                        sample_std=0.1)
    policy = FullyConnectedPolicy(pcfg)
    variables = policy.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, env.dim_state)))
    params = variables["params"]
    if args.checkpoint:
        params = load_model(args.checkpoint, like_params=params)
    return policy, {"params": params,
                    "constants": variables.get("constants", {})}


def _export_video(env, traj, out_path, kin_traj=None):
    """Render recorded sim poses to MP4/GIF/PNG (the TinyRenderer /
    getCameraImage replacement, env_renderer.py:141-161).

    traj: list of (root_p, root_q, joint_q) numpy tuples.
    kin_traj: optional same-shaped list for the kinematic twin overlay.
    """
    import jax.numpy as jnp
    from .physics import fk as fk_mod
    from .physics import state as state_mod
    from .runtime.render import render_rollout

    def fk_seq(tr):
        root_p = jnp.asarray(np.stack([t[0] for t in tr]))
        root_q = jnp.asarray(np.stack([t[1] for t in tr]))
        joint_q = jnp.asarray(np.stack([t[2] for t in tr]))
        sim = state_mod.from_pose(env.model, root_p, root_q, joint_q)
        k = jax.jit(lambda s: fk_mod.fk(env.model, s))(sim)
        return np.asarray(k.body_q), np.asarray(k.body_p)

    q_seq, p_seq = fk_seq(traj)
    kin = fk_seq(kin_traj) if kin_traj else None
    hm = getattr(env, "ground", None)
    hm = hm if hasattr(hm, "height_at") else None
    out = render_rollout(env.cm, q_seq, p_seq, out_path,
                         fps=int(env.cfg.fps_con), heightmap=hm,
                         v_up=int(np.argmax(np.abs(env.model.v_up_env))),
                         kin_seq=kin)
    print("rendered:", out)
    return out


_VIDEO_EXT = (".mp4", ".gif", ".png")


def mode_load(args):
    """Headless runtime: roll episodes, print rewards, export trajectory
    (BVH) or a rendered clip (MP4/GIF/PNG)."""
    import jax.numpy as jnp
    from .runtime.export import export_bvh
    from .kinematics.bvh import load_bvh

    spec, env = build(args)
    _, _, vae_bundle = build_custom_policy(args, spec, env)
    if vae_bundle is not None:
        # physics_vae runtime (loco_runtime_physics_vae.yaml): drive the
        # EnvRunner in full or pass_through mode.
        from .runtime.runner import EnvRunner
        from .train.checkpoint import load_model

        model, variables, vcfg = vae_bundle
        if args.checkpoint:
            variables = dict(variables)
            variables["params"] = load_model(args.checkpoint,
                                             like_params=variables["params"])
        runner = EnvRunner(env, model, variables,
                           rng=jax.random.PRNGKey(args.seed), explore=False)
        runner.policy_eval_method = args.eval_method
        if args.fixed_z_seed is not None:
            # z-sweep probe: one prior sample, held for every step of
            # every episode (distinct seeds -> distinct behaviors iff the
            # latent is informative)
            dim_z = model.cfg.task_encoder_output_dim
            runner.fixed_z = jax.random.normal(
                jax.random.PRNGKey(args.fixed_z_seed), (dim_z,))
            print(f"fixed z from seed {args.fixed_z_seed}: "
                  f"|z|={float(jnp.linalg.norm(runner.fixed_z)):.2f}")
        for ep in range(args.num_episodes):
            runner.reset()
            record = bool(args.output
                          and args.output.endswith(_VIDEO_EXT))
            out = runner.run_episode(
                max_steps=env.cfg.fps_con * 30, record=record)
            rews, traj = out if record else (out, None)
            print(f"episode {ep} ({args.eval_method}): len={len(rews)} "
                  f"mean_rew={np.mean(rews):.3f}")
            if record and traj:
                base, ext = args.output.rsplit(".", 1)
                _export_video(env, traj, f"{base}_ep{ep}.{ext}")
        return

    policy, variables = _load_policy(args, env)

    @jax.jit
    def policy_step(st):
        """One composite (observe -> policy mean -> env.step) device call —
        keeps the interactive loop to a single dispatch per control step."""
        obs = env.observe(st)
        logits, _ = policy.apply(variables, obs[None])
        action = logits[0, :env.dim_action]
        st, obs, rew, done, info = env.step(st, action)
        return st, rew, done

    rng = jax.random.PRNGKey(args.seed)

    for ep in range(args.num_episodes):
        rng, k = jax.random.split(rng)
        st = env.reset(k)
        rews, traj = [], []
        for t in range(env.cfg.fps_con * 30):
            st, rew, done = policy_step(st)
            rews.append(float(rew))
            traj.append((np.asarray(st.sim.root_p),
                         np.asarray(st.sim.root_q),
                         np.asarray(st.sim.joint_q)))
            if bool(done):
                break
        print(f"episode {ep}: len={len(rews)} mean_rew={np.mean(rews):.3f}")
        if args.output and args.output.endswith(_VIDEO_EXT):
            base, ext = args.output.rsplit(".", 1)
            _export_video(env, traj, f"{base}_ep{ep}.{ext}")
        elif args.output:
            root_p = np.stack([t[0] for t in traj])
            root_q = np.stack([t[1] for t in traj])
            joint_q = np.stack([t[2] for t in traj])
            hier = load_bvh(env.cfg.base_motion_file)
            out = f"{args.output}_ep{ep}.bvh"
            export_bvh(out, env.char_info, hier, root_p, root_q, joint_q,
                       fps=env.cfg.fps_con)
            print("exported:", out)


def mode_gen_expert_demo(args):
    from .train.demo_gen import DemoGenConfig, generate_demos

    spec, env = build(args)
    policy, variables = _load_policy(args, env)
    cfg = DemoGenConfig(window_size=args.demo_window,
                        stride=args.demo_stride)

    def policy_fn(obs, rng, explore):
        import jax.numpy as jnp
        logits, _ = policy.apply(variables, obs)
        mean = logits[..., :env.dim_action]
        if explore:
            return mean + jax.random.normal(rng, mean.shape) * cfg.exp_std
        return mean

    out = args.output or (
        f"data_iter={cfg.iter_per_episode},winsize={cfg.window_size:.2f},"
        f"stride={cfg.stride:.2f},state_type={cfg.state_type},"
        f"exp_std={cfg.exp_std:.2f}.pkl")
    data = generate_demos(env, policy_fn, jax.random.PRNGKey(args.seed),
                          cfg, output_path=out)
    print(f"saved {len(data['episodes'])} episodes ->", out)


def main(argv=None):
    args = arg_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from .parallel.distributed import init_distributed, process_info
    if init_distributed(args.coordinator, args.num_processes,
                        args.process_id):
        print("multi-host:", process_info())
    if args.mode == "train":
        mode_train(args)
    elif args.mode == "load":
        mode_load(args)
    else:
        mode_gen_expert_demo(args)


if __name__ == "__main__":
    main()
