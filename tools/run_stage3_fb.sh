#!/bin/bash
# Anti-collapse follow-up for the round-3 stage-3 proof: if the plain
# vae_kl_coeff sweep (tools/run_stage23.sh) leaves the latent collapsed
# (loss_kl ~ 0), rerun the cVAE phase with free bits + beta-annealing
# (the spec-opt-in controls, train/vae.py) on the SAME demo dataset and
# the SAME pretrained world model, then eval full vs pass_through.
#
# Run alone on the TPU:  bash tools/run_stage3_fb.sh [demo_pickle]
set -e
cd "$(dirname "$0")/.."

DEMO=${1:-/root/repo/data/learning/demo_r3.pkl}
VAE_DIR=data/learning/r3_vae_fb
RUNTIME_SPEC=/root/reference/data/spec/loco/loco_runtime_physics_vae.yaml
# reuse the already-pretrained world model from the first sweep trial
WM=$(ls -d data/learning/r3_vae/r3_kl=*/ckpt_final 2>/dev/null | head -1)

ARGS=(--data_train "$DEMO" --batch_size 256
      --lr 0.0005 --lr_schedule step
      --vae_kl_coeff 1.0 --vae_kl_coeff 0.1
      --vae_free_bits 0.03 --vae_kl_anneal_iters 100
      --name r3fb --local_dir "$VAE_DIR" --checkpoint_freq 200)
if [ -n "$WM" ]; then
  # world model already pretrained by the first sweep: cVAE phase only
  ARGS+=(--world_model "$WM" --max_iter 500)
else
  ARGS+=(--max_iter_world_model 300 --max_iter 800)
fi

echo "=== stage 3 (free bits + annealing): ${ARGS[*]} ==="
python -m physicsvae_tpu.train_physics_vae "${ARGS[@]}"

echo "=== runtime eval: full vs pass_through per trial ==="
for ckpt in "$VAE_DIR"/r3fb_kl=*/ckpt_final; do
  trial=$(basename "$(dirname "$ckpt")")
  for method in full pass_through; do
    echo "--- $trial / $method ---"
    python -m physicsvae_tpu.driver --mode load \
      --spec "$RUNTIME_SPEC" --project_dir /root/reference \
      --checkpoint "$ckpt" --eval_method "$method" \
      --num_episodes 8 --seed 11 --allow_missing_weights
  done
done
