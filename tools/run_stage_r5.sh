#!/bin/bash
# Round-5 quality pipeline (VERDICT r4 items 4+5):
#   stage 2': regenerate expert demos with the PARITY-FIXED generator
#             (fallen windows dropped entirely, state_type plumbed)
#   stage 3': retrain world model + cVAE on the clean dataset
#   stage 4': runtime fine-tune (frozen motor decoder + world model,
#             trainable task encoder + value — the reference recipe,
#             rllib_model_torch.py:930-950) to QUALITY, not just
#             freeze-proof
#   eval:     before/after tables via the batched scanned evaluator
#
# Run alone on the TPU:  bash tools/run_stage_r5.sh
set -e
shopt -s nullglob
cd "$(dirname "$0")/.."

DEMO=data/learning/demo_r5.pkl
EXPERT=data/learning/r3_expert/ckpt_final
VAE_DIR=data/learning/r5_vae
FT_DIR=data/learning/r5_runtime_finetune
KL=0.0001
mkdir -p "$VAE_DIR" "$FT_DIR"

if [ ! -f "$DEMO" ]; then
  echo "=== stage 2': clean expert demos -> $DEMO ==="
  # 15 s windows: with reference falldown semantics a window only counts
  # if the expert survives ALL of it; the r3 expert's mean survival is
  # ~20 s (episode_len_mean 606 @30 Hz), so full-58s windows yield ~3
  # clean episodes while 15 s windows + <=10 retries yield the full
  # 10x10x3 grid of clean ones (~135k pairs, r3-dataset scale).
  python -m physicsvae_tpu.driver --mode gen_expert_demo \
    --spec /root/reference/data/spec/loco/loco_imitation.yaml \
    --project_dir /root/reference \
    --demo_window 15 --demo_stride 15 \
    --checkpoint "$EXPERT" --output "$DEMO" --seed 7
fi

CKPT=$(find "$VAE_DIR" -maxdepth 2 -name ckpt_final -path "*r5_kl=${KL}_*" | head -1)
if [ -z "$CKPT" ]; then
  echo "=== stage 3': WM (300) + cVAE (500) on the clean dataset ==="
  python -m physicsvae_tpu.train_physics_vae \
    --data_train "$DEMO" --batch_size 256 \
    --lr 0.0005 --lr_schedule step \
    --max_iter_world_model 300 --max_iter 800 \
    --vae_kl_coeff $KL --vae_kl_anneal_iters 100 --test_frac 0.02 \
    --name r5 --local_dir "$VAE_DIR" --checkpoint_freq 250
  CKPT=$(find "$VAE_DIR" -maxdepth 2 -name ckpt_final -path "*r5_kl=${KL}_*" | head -1)
fi
[ -n "$CKPT" ] && [ -d "$CKPT" ] || { echo "no cVAE ckpt found"; exit 1; }
echo "cVAE checkpoint: $CKPT"

echo "=== eval BEFORE fine-tune (batched evaluator) ==="
python tools/eval_table.py --checkpoint "$CKPT" --episodes 10 \
  --max_steps 900 --z_seeds 1,2,3,4 --label before \
  --out "$FT_DIR/eval_before.json"

echo "=== stage 4': runtime fine-tune to quality ==="
python tools/run_runtime_finetune.py --ckpt "$CKPT" \
  --num_iter "${FT_ITERS:-80}" --num_envs 1024 --rollout_length 64 \
  --out "$FT_DIR"

echo "=== eval AFTER fine-tune ==="
python tools/eval_table.py --checkpoint "$FT_DIR/ckpt_final" \
  --episodes 10 --max_steps 900 --z_seeds 1,2,3,4 --label after \
  --out "$FT_DIR/eval_after.json"

echo "r5 quality pipeline complete"
