#!/bin/bash
# Anti-collapse follow-up for the round-3 stage-3 proof: the plain
# vae_kl_coeff=1.0 sweep (tools/run_stage23.sh) left the latent collapsed
# (loss_kl ~ -4e-5 by cVAE epoch 1), so rerun the cVAE phase with
# free bits + beta-annealing (the spec-opt-in controls, train/vae.py) on
# the SAME demo dataset and the SAME pretrained world model, then eval
# full vs pass_through.  Each KL trial trains AND evals before the next
# starts, so an interrupted run still leaves complete evidence.
#
# Run alone on the TPU:  bash tools/run_stage3_fb.sh [demo_pickle]
set -e
shopt -s nullglob  # a trial without ckpt_final skips eval, not abort
cd "$(dirname "$0")/.."

DEMO=${1:-/root/repo/data/learning/demo_r3.pkl}
VAE_DIR=data/learning/r3_vae_fb
RUNTIME_SPEC=/root/reference/data/spec/loco/loco_runtime_physics_vae.yaml
# reuse the already-pretrained world model from the first sweep trial
# (ckpt_final if the sweep finished, else its latest periodic checkpoint;
# the interrupted r3 sweep's ckpt_000200 carries a 200/300-epoch WM at
# s-recon loss 0.0049 vs 0.0042 at epoch 300 — near-converged)
WM=$(ls -d data/learning/r3_vae/r3_kl=*/ckpt_final 2>/dev/null | head -1)
if [ -z "$WM" ]; then
  WM=$(ls -d data/learning/r3_vae/r3_kl=*/ckpt_0* 2>/dev/null | sort | tail -1)
fi

for KL in 1.0 0.1; do
  ARGS=(--data_train "$DEMO" --batch_size 256
        --lr 0.0005 --lr_schedule step
        --vae_kl_coeff "$KL"
        --vae_free_bits 0.03 --vae_kl_anneal_iters 100
        --name r3fb --local_dir "$VAE_DIR" --checkpoint_freq 100)
  if [ -n "$WM" ]; then
    # world model already pretrained by the first sweep: cVAE phase only
    ARGS+=(--world_model "$WM" --max_iter 500)
  else
    ARGS+=(--max_iter_world_model 300 --max_iter 800)
  fi

  echo "=== stage 3 (free bits + annealing, kl=$KL): ${ARGS[*]} ==="
  python -m physicsvae_tpu.train_physics_vae "${ARGS[@]}"

  for ckpt in "$VAE_DIR"/r3fb_kl=${KL}_*/ckpt_final; do
    trial=$(basename "$(dirname "$ckpt")")
    for method in full pass_through; do
      echo "--- $trial / $method ---"
      python -m physicsvae_tpu.driver --mode load \
        --spec "$RUNTIME_SPEC" --project_dir /root/reference \
        --checkpoint "$ckpt" --eval_method "$method" \
        --num_episodes 8 --seed 11 --allow_missing_weights
    done
  done
done
