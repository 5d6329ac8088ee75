#!/bin/bash
# Round-3 pipeline proof: stage 2 (expert demos from the saturated PPO
# checkpoint) -> stage 3 (full-recipe world model + cVAE, README.md:124-131
# schedule, with a vae_kl_coeff sweep) -> runtime eval (full vs pass_through
# on loco_runtime_physics_vae.yaml, 30 s episodes).
#
# Run alone on the TPU:  bash tools/run_stage23.sh [demo_pickle]
set -e
cd "$(dirname "$0")/.."

DEMO=${1:-/tmp/demo_r3.pkl}
EXPERT=data/learning/r3_expert/ckpt_final
VAE_DIR=data/learning/r3_vae
RUNTIME_SPEC=/root/reference/data/spec/loco/loco_runtime_physics_vae.yaml

if [ ! -f "$DEMO" ]; then
  echo "=== stage 2: gen_expert_demo -> $DEMO ==="
  python -m physicsvae_tpu.driver --mode gen_expert_demo \
    --spec /root/reference/data/spec/loco/loco_imitation.yaml \
    --project_dir /root/reference \
    --checkpoint "$EXPERT" --output "$DEMO" --seed 7
fi

echo "=== stage 3: world model (300) + cVAE (500), kl sweep ==="
python -m physicsvae_tpu.train_physics_vae \
  --data_train "$DEMO" \
  --max_iter_world_model 300 --max_iter 800 \
  --batch_size 256 --lr 0.0005 --lr_schedule step \
  --vae_kl_coeff 1.0 --vae_kl_coeff 0.1 --vae_kl_coeff 0.01 \
  --name r3 --local_dir "$VAE_DIR" --checkpoint_freq 200

echo "=== runtime eval: full vs pass_through per trial ==="
for ckpt in "$VAE_DIR"/r3_kl=*/ckpt_final; do
  trial=$(basename "$(dirname "$ckpt")")
  for method in full pass_through; do
    echo "--- $trial / $method ---"
    python -m physicsvae_tpu.driver --mode load \
      --spec "$RUNTIME_SPEC" --project_dir /root/reference \
      --checkpoint "$ckpt" --eval_method "$method" \
      --num_episodes 8 --seed 11 --allow_missing_weights
  done
done
