#!/usr/bin/env python
"""Runtime fine-tuning of PhysicsVAE through PPO (VERDICT r3 item 7).

The reference's runtime stage (loco_runtime_physics_vae.yaml +
rllib_model_torch.py:930-950) constructs the policy as the pretrained
cVAE with the motor decoder and world model FROZEN, then fine-tunes the
task encoder (and value branch) with DDPPO.  This script records that
run end-to-end on a round-4 cVAE checkpoint and PROVES the freeze:

  1. derive a fine-tune spec from the reference runtime YAML —
     custom_model_config gains per-component load paths into the cVAE
     checkpoint plus `motor_decoder_learnable: false` /
     `world_model_learnable: false`;
  2. run `driver --mode train` for a few PPO iterations;
  3. reload the resulting ckpt_final and assert the frozen components
     are BIT-IDENTICAL to the preload while the task encoder moved.

Usage:  python tools/run_runtime_finetune.py [--ckpt DIR] [--num_iter N]
        (TPU by default; --cpu forces the CPU backend for smoke runs)
"""
import argparse
import glob
import json
import os
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_SPEC = "/root/reference/data/spec/loco/loco_runtime_physics_vae.yaml"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--num_iter", type=int, default=3)
    ap.add_argument("--num_envs", type=int, default=256)
    ap.add_argument("--rollout_length", type=int, default=32)
    ap.add_argument("--out", default="data/learning/r4_runtime_finetune")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grad_clip", type=float, default=0.5)
    ap.add_argument("--all_trainable", action="store_true",
                    help="fine-tune every component (what the shipped "
                         "reference runtime spec does — it sets no "
                         "*_learnable flags, loco_runtime_physics_vae."
                         "yaml:30-35); default freezes decoder+WM per "
                         "rllib_model_torch.py:930-950")
    args = ap.parse_args()

    ckpt = args.ckpt
    if not ckpt:
        cands = sorted(glob.glob(os.path.join(
            REPO, "data/learning/r4_vae/r4_kl=0.0001_*/ckpt_final")))
        assert cands, "no r4 cVAE checkpoint found; pass --ckpt"
        ckpt = cands[0]
    ckpt = os.path.abspath(ckpt)
    print("cVAE checkpoint:", ckpt)

    with open(REF_SPEC) as f:
        spec = yaml.safe_load(f)
    cmc = spec["config"]["model"]["custom_model_config"]
    # the reference points load_weights at its missing pretrained blob
    # (data/pretrained/loco_modelV1.pt); the fine-tune spec points at the
    # real round-4 checkpoint instead, with decoder + world model frozen
    cmc["load_weights"] = ckpt
    if not args.all_trainable:
        cmc["motor_decoder_learnable"] = False
        cmc["world_model_learnable"] = False
    # Stochastic-logits PPO needs bounded updates (see
    # PPOConfig.log_ratio_clip); rllib-style gradient clipping on top.
    spec["config"]["grad_clip"] = args.grad_clip
    spec_path = os.path.join(REPO, "data/spec/loco_runtime_finetune_r4.yaml")
    os.makedirs(os.path.dirname(spec_path), exist_ok=True)
    with open(spec_path, "w") as f:
        yaml.safe_dump(spec, f, sort_keys=False)
    print("fine-tune spec:", spec_path)

    out_dir = os.path.join(REPO, args.out)
    env = dict(os.environ)
    cmd = [sys.executable, "-m", "physicsvae_tpu.driver",
           "--mode", "train", "--spec", spec_path,
           "--project_dir", "/root/reference",
           "--num_envs", str(args.num_envs),
           "--rollout_length", str(args.rollout_length),
           "--num_iter", str(args.num_iter),
           "--local_dir", out_dir, "--checkpoint_freq", "1000000"]
    if args.cpu:
        # JAX_PLATFORMS alone is ignored when the TPU plugin is installed
        env["JAX_PLATFORMS"] = "cpu"
        cmd += ["--platform", "cpu"]
    print("+", " ".join(cmd), flush=True)
    rc = subprocess.run(cmd, env=env, cwd=REPO).returncode
    assert rc == 0, f"fine-tune run failed rc={rc}"

    # ---- freeze proof: frozen components bit-identical, encoder moved --
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from physicsvae_tpu.train.checkpoint import load_model

    final = os.path.join(out_dir, "ckpt_final")
    post = load_model(final)
    pre_full = load_model(ckpt, like_params=post)

    report = {"ckpt_pre": ckpt, "ckpt_post": final,
              "num_iter": args.num_iter,
              "all_trainable": bool(args.all_trainable),
              "components": {}}
    ok = True
    frz = not args.all_trainable
    # The world model stays bit-identical EITHER way: even when
    # trainable it receives zero gradient from the PPO loss (its output
    # is not in the surrogate), and Adam applies no update to a
    # zero-gradient leaf.
    for comp, want_frozen in [("motor_decoder", frz),
                              ("world_model", True),
                              ("task_encoder", False)]:
        a = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(pre_full[comp])])
        b = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(post[comp])])
        bit = bool((a == b).all())
        report["components"][comp] = {
            "frozen": want_frozen, "bit_identical": bit,
            "max_abs_diff": float(np.abs(a - b).max()), "params": int(a.size)}
        status = "OK" if bit == want_frozen else "FAIL"
        if bit != want_frozen:
            ok = False
        print(f"{comp}: bit_identical={bit} (want frozen={want_frozen}) "
              f"max|d|={np.abs(a - b).max():.3e} [{status}]")

    with open(os.path.join(out_dir, "freeze_proof.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("report:", os.path.join(out_dir, "freeze_proof.json"))
    assert ok, "freeze proof FAILED"
    print("runtime fine-tune freeze proof OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
